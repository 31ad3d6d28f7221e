package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Aggregation + window/burst operators (SURVEY §2.5-§2.7) over the synthetic
 * tables. Means use the Exact decimal-sum trick for cross-engine parity;
 * integer/positional math is exact by construction.
 */
object Aggregates {
  import Tables._

  private val wUser = Window.partitionBy("user_id").orderBy("ts", "event_id")

  def qs: Seq[Q] = Seq(
    // average_burst: mean over the sample dim keeping group keys
    // (stglib/aqd/aqdutils.py:1717-1741); burst = (user, day)
    Q("avg_burst",
      (s, dir) => events(s, dir)
        .groupBy(col("user_id"), expr("ts div 86400000000000").as("day"))
        .agg(Exact.avg(col("value")).as("value_mean"),
             count(col("value")).as("n"),
             min(col("value")).as("value_min"),
             max(col("value")).as("value_max")),
      Some(s"""SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             |  ${Exact.avgSql("value")} AS value_mean,
             |  count(value) AS n, min(value) AS value_min, max(value) AS value_max
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ds_mean_count_minf: mean only where enough valid samples
    // (stglib/core/utils.py:2044-2086)
    Q("mean_minf",
      (s, dir) => events(s, dir)
        .groupBy("user_id")
        .agg(when(count(col("value")) >= 60, Exact.avg(col("value"))).as("value_mean"),
             count(col("value")).as("n")),
      Some(s"""SELECT user_id,
             |  CASE WHEN count(value) >= 60 THEN ${Exact.avgSql("value")} END AS value_mean,
             |  count(value) AS n
             |FROM events GROUP BY user_id""".stripMargin)),

    // avg_cont: tumbling event-time windows (stglib/mar.py:259-332) — uses
    // Spark's window() so the identical plan runs under Structured Streaming
    Q("avg_cont",
      (s, dir) => events(s, dir)
        .withColumn("t", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("t"), "6 hours"))
        .agg(Exact.avg(col("value")).as("value_mean"), count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("bucket_s"),
                col("value_mean"), col("n")),
      Some(s"""SELECT (epoch_us(ts) // 21600000000) * 21600 AS bucket_s,
             |  ${Exact.avgSql("value")} AS value_mean, count(*) AS n
             |FROM events GROUP BY 1""".stripMargin)),

    // make_vector_average_vars: circular mean of angles
    // (stglib/core/utils.py:1907-1923): atan2(mean sin, mean cos)
    Q("circ_mean",
      (s, dir) => events(s, dir)
        .withColumn("dir", col("value") * 3.6)
        .groupBy("user_id")
        .agg(round(
          (degrees(atan2(avg(sin(radians(col("dir")))),
                         avg(cos(radians(col("dir")))))) + 360.0) % 360.0,
          4).as("dir_mean")),
      Some("""SELECT user_id,
             |  round(fmod(degrees(atan2(avg(sin(radians(value * 3.6))),
             |                           avg(cos(radians(value * 3.6))))) + 360.0,
             |             360.0), 4) AS dir_mean
             |FROM events GROUP BY user_id""".stripMargin)),

    // add_min_max + add_start_stop_time metadata stats
    // (stglib/core/utils.py:183-235,942-948)
    Q("minmax_meta",
      (s, dir) => events(s, dir)
        .agg(min("value").as("value_min"), max("value").as("value_max"),
             expr("min(ts div 1000)").as("start_us"),
             expr("max(ts div 1000)").as("stop_us"),
             count(lit(1)).as("n")),
      Some("""SELECT min(value) AS value_min, max(value) AS value_max,
             |  min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS stop_us,
             |  count(*) AS n FROM events""".stripMargin)),

    // linregress (index-velocity rating, stglib/indexvel.py:120-134):
    // closed-form OLS from exact decimal moment sums; the only double ops are
    // the final casts/divisions, so both engines agree bitwise
    Q("linregress",
      (s, dir) => lineitem(s, dir)
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(20,2)")).as("sx"),
          sum(col("l_extendedprice").cast("decimal(20,2)")).as("sy"),
          sum((col("l_quantity").cast("decimal(20,2)") *
               col("l_quantity").cast("decimal(20,2)")).cast("decimal(30,4)")).as("sxx"),
          sum((col("l_extendedprice").cast("decimal(20,2)") *
               col("l_extendedprice").cast("decimal(20,2)")).cast("decimal(30,4)")).as("syy"),
          sum((col("l_quantity").cast("decimal(20,2)") *
               col("l_extendedprice").cast("decimal(20,2)")).cast("decimal(30,4)")).as("sxy"))
        .selectExpr(
          "cast((n * sxy - sx * sy) as double) / cast((n * sxx - sx * sx) as double) as slope",
          "(cast(sy as double) - cast((n * sxy - sx * sy) as double) / cast((n * sxx - sx * sx) as double) * cast(sx as double)) / n as intercept",
          "cast((n * sxy - sx * sy) as double) / (sqrt(cast(n * sxx - sx * sx as double)) * sqrt(cast(n * syy - sy * sy as double))) as r"),
      Some("""WITH m AS (
             |  SELECT count(*) AS n,
             |    sum(CAST(l_quantity AS DECIMAL(20,2))) AS sx,
             |    sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS sy,
             |    sum(CAST(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_quantity AS DECIMAL(20,2)) AS DECIMAL(30,4))) AS sxx,
             |    sum(CAST(CAST(l_extendedprice AS DECIMAL(20,2)) * CAST(l_extendedprice AS DECIMAL(20,2)) AS DECIMAL(30,4))) AS syy,
             |    sum(CAST(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_extendedprice AS DECIMAL(20,2)) AS DECIMAL(30,4))) AS sxy
             |  FROM lineitem)
             |SELECT
             |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
             |  (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n AS intercept,
             |  CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
             |FROM m""".stripMargin)),

    // trapezoid integration (spectral moments m0, stglib/core/waves.py:936-938)
    // over the per-user series: Σ ½(vᵢ+vᵢ₊₁)Δ with Δ=1, exact decimal sum
    Q("trapz_moment",
      (s, dir) => events(s, dir)
        .withColumn("vnext", lead(col("value"), 1).over(wUser))
        .groupBy("user_id")
        .agg(sum(((col("value").cast("decimal(20,2)") + col("vnext").cast("decimal(20,2)")) /
                  lit(2)).cast("decimal(30,6)")).cast("double").as("m0")),
      Some("""SELECT user_id, CAST(sum(CAST((CAST(value AS DECIMAL(20,2)) +
             |    CAST(vnext AS DECIMAL(20,2))) / 2 AS DECIMAL(30,6))) AS DOUBLE) AS m0
             |FROM (
             |  SELECT user_id, value, lead(value) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id) AS vnext
             |  FROM events)
             |GROUP BY user_id""".stripMargin)),

    // spectral peak selection: top-1 by energy per series
    // (make_Tp, stglib/core/waves.py:951-961)
    Q("top1_peak",
      // map-side-combinable aggregation, not a window: at 100 TB a window
      // shuffles every row, max(struct) pre-aggregates per partition.
      // Tie-break: max value, then smallest event_id (negated in the struct).
      (s, dir) => events(s, dir)
        .groupBy("user_id")
        .agg(max(struct(col("value"), (-col("event_id")).as("nid"))).as("m"))
        .select(col("user_id"), (-col("m.nid")).as("event_id"),
          col("m.value").as("value")),
      Some("""SELECT user_id, event_id, value FROM (
             |  SELECT user_id, event_id, value, row_number() OVER
             |    (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin)),

    // ---- §2.6 window/series ops --------------------------------------
    // one-step lag/lead diffs (np.ediff1d, stglib/core/qaqc.py:91,364)
    Q("lag_lead_diff",
      (s, dir) => events(s, dir)
        .withColumn("dprev", coalesce(col("value") - lag("value", 1).over(wUser), lit(0.0)))
        .withColumn("dnext", coalesce(lead("value", 1).over(wUser) - col("value"), lit(0.0)))
        .select("event_id", "dprev", "dnext"),
      Some("""SELECT event_id,
             |  coalesce(value - lag(value) OVER w, 0.0) AS dprev,
             |  coalesce(lead(value) OVER w - value, 0.0) AS dnext
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // shift_time: constant clock-error shift (stglib/core/utils.py:997-1029)
    Q("shift_time",
      (s, dir) => events(s, dir)
        .selectExpr("event_id", "ts div 1000 - 7000000 as ts_shifted"),
      Some("SELECT event_id, epoch_us(ts) - 7000000 AS ts_shifted FROM events")),

    // ClockDrift: per-row linearly interpolated shift, floored to whole
    // seconds (stglib/core/utils.py:1031-1047); needs rn and total count
    Q("clock_drift",
      (s, dir) => {
        val drift_us = -120000000.0 // −120 s accumulated drift
        events(s, dir)
          .withColumn("rn", row_number().over(wUser))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
          .selectExpr("event_id",
            s"ts div 1000 + cast(floor((rn - 1) * $drift_us / (n - 1) / 1000000) as bigint) * 1000000 as ts_adj")
      },
      Some("""SELECT event_id, epoch_us(ts) +
             |  CAST(floor((rn - 1) * -120000000.0 / (n - 1) / 1000000) AS BIGINT) * 1000000 AS ts_adj
             |FROM (
             |  SELECT event_id, ts,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             |    count(*) OVER (PARTITION BY user_id) AS n
             |  FROM events)""".stripMargin)),

    // burst reshaping: continuous → (burst, sample) ids, truncated to whole
    // bursts (make_wave_bursts_mi, stglib/core/waves.py:2037-2091)
    Q("burst_reshape",
      (s, dir) => events(s, dir)
        .withColumn("rn", row_number().over(wUser) - 1)
        .select(col("event_id"), col("user_id"),
          (col("rn") / 16).cast("long").as("burst"),
          (col("rn") % 16).cast("long").as("sample")),
      Some("""SELECT event_id, user_id, rn // 16 AS burst, rn % 16 AS sample FROM (
             |  SELECT event_id, user_id, row_number() OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
             |  FROM events)""".stripMargin)),

    // truncate-to-last-full-burst (stglib/rsk/csv2cdf.py:62-68): keep only
    // bursts with a complete sample count
    Q("burst_truncate",
      (s, dir) => {
        val df = events(s, dir)
          .withColumn("rn", row_number().over(wUser) - 1)
          .withColumn("burst", (col("rn") / 16).cast("long"))
        df.withColumn("bn", count(lit(1)).over(
            Window.partitionBy("user_id", "burst")))
          .filter(col("bn") === 16)
          .select("event_id", "user_id", "burst")
      },
      Some("""SELECT event_id, user_id, burst FROM (
             |  SELECT event_id, user_id, burst, count(*) OVER
             |    (PARTITION BY user_id, burst) AS bn
             |  FROM (
             |    SELECT event_id, user_id, row_number() OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn,
             |      (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 16 AS burst
             |    FROM events))
             |WHERE bn = 16""".stripMargin)),

    // rolling median smoother output (scipy.signal.medfilt analog,
    // stglib/core/filter.py:157-229), shrinking-window edges
    // `+ 0.0` on BOTH engines: a window of signed zeros yields -0.0 or 0.0
    // depending on the engine's sort placement of the two zeros (Spark
    // orders -0.0 < 0.0, SQL compares them equal) — the IEEE identity
    // x + 0.0 collapses -0.0 to 0.0 and is a no-op for every other value
    Q("rolling_median",
      (s, dir) => events(s, dir)
        .withColumn("med", graft.ops.Trims.rollingMedian(
          "value", 5, Seq("ts", "event_id"), Seq("user_id"), zeroPad = false)
          + lit(0.0))
        .select("event_id", "med"),
      Some("""SELECT event_id, median(value) OVER
             |  (PARTITION BY user_id ORDER BY ts, event_id
             |   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) + 0.0 AS med
             |FROM events""".stripMargin))
  )
}
