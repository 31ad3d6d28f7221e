package graft.queries

import graft.ops.{Clip, Drift, MaskExpr, Trims}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational operator queries (SURVEY §2.3 clip/trim family + §2.5 aggs)
 * expressed over the driver's synthetic tables, each with a DuckDB oracle.
 *
 * Conventions:
 *  - `events.ts` is nanosecond-precision parquet; Spark reads it as raw long
 *    nanos (spark.sql.legacy.parquet.nanosAsLong) and oracles emit
 *    `epoch_ns(ts)` so both sides compare as BIGINT nanoseconds — exact.
 *  - Masked-value outputs are raw parquet doubles (bitwise identical on both
 *    sides); only derived arithmetic (sums/avgs) is rounded for hash parity.
 *  - Every windowed op orders by (ts, event_id) within user_id — event_id is
 *    unique so ordering is total and deterministic. At 100 TB the same plans
 *    hold: trims partition by series key (user/deployment), never a global
 *    single-partition window.
 */
object Relational {
  import Tables._

  /** Epoch nanoseconds for an ISO date/time literal (UTC). */
  private def ns(s: String): Long = {
    val iso = if (s.length == 10) s + "T00:00:00Z" else s + "Z"
    java.time.Instant.parse(iso).toEpochMilli * 1000000L +
      java.time.Instant.parse(iso).getNano % 1000000L
  }

  // per-user series window, total order
  private val wUser = Window.partitionBy("user_id").orderBy("ts", "event_id")

  def qs: Seq[Q] = Seq(
    // ---- §2.5 flagship aggregation (TPC-H Q1 shape) -------------------
    Q("q1_agg",
      (s, dir) => lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 6) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- multi-join OLAP shapes (TPC-H Q3/Q5) — dims broadcast by AQE,
    // facts shuffle on their join keys; revenue sums follow the exact
    // DECIMAL discipline so both engines agree bitwise ----------------
    Q("q3_shipping",
      (s, dir) => {
        val rev = sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .cast("decimal(30,4)")).cast("double")
        lineitem(s, dir).filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
          .join(orders(s, dir)
            .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, dir).filter(col("c_mktsegment") === "BUILDING"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(rev.as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
          // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC, so the cast is
          // an identity reinterpretation and epoch_us(DuckDB) agrees
          .selectExpr("l_orderkey",
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate", "revenue")
      },
      Some("""SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate,
             |  CAST(sum(CAST(round(l_extendedprice * (1.0e0 - l_discount), 4)
             |    AS DECIMAL(30,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |  AND o_orderdate < TIMESTAMP '1998-07-01'
             |JOIN customer ON o_custkey = c_custkey
             |  AND c_mktsegment = 'BUILDING'
             |WHERE l_shipdate > TIMESTAMP '1998-07-01'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    Q("q5_region",
      (s, dir) => {
        val rev = sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .cast("decimal(30,4)")).cast("double")
        customer(s, dir)
          .join(orders(s, dir)
            .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
          .join(lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .join(supplier(s, dir),
            col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .join(nation(s, dir), col("s_nationkey") === col("n_nationkey"))
          .join(region(s, dir).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(rev.as("revenue"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(round(l_extendedprice * (1.0e0 - l_discount), 4)
             |    AS DECIMAL(30,4))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |  AND o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin)),

    // rollup: all three grouping levels in ONE scan via Catalyst's Expand
    // (vs three separate aggregations + union)
    Q("q1_rollup",
      (s, dir) => lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(30,2)")).cast("double").as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // explicit-value pivot: long → wide event counts per user bucket; the
    // pivot value list is fixed so the output schema is static (the only
    // scale-safe form — inferred pivots scan twice and can explode columns)
    Q("events_pivot",
      (s, dir) => events(s, dir)
        .withColumn("bucket", col("user_id") % 10)
        .groupBy("bucket")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L),
      Some("""SELECT user_id % 10 AS bucket,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
             |FROM events GROUP BY 1""".stripMargin)),

    // ordered funnel analysis (view → click → purchase): each step's time
    // is the FIRST matching event strictly after the previous step — two
    // chained per-user aggregation passes (conditional min over ts), state
    // bounded at three timestamps per user, shuffles keyed on the
    // high-cardinality user id. The canonical event-analytics op.
    Q("event_funnel",
      (s, dir) => {
        val ev = events(s, dir).select("user_id", "event_type", "ts")
        val s1 = ev.groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
        val s2 = ev.join(s1, "user_id")
          .groupBy("user_id", "t_view")
          .agg(min(when(col("event_type") === "click" &&
            col("ts") > col("t_view"), col("ts"))).as("t_click"))
        val s3 = ev.join(s2, "user_id")
          .groupBy("user_id", "t_view", "t_click")
          .agg(min(when(col("event_type") === "purchase" &&
            col("ts") > col("t_click"), col("ts"))).as("t_purchase"))
        s3.select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"),
          (when(col("t_purchase").isNotNull, 3)
            .when(col("t_click").isNotNull, 2)
            .when(col("t_view").isNotNull, 1)
            .otherwise(0)).cast("int").as("steps_reached"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events),
             |s1 AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
             |  FROM e GROUP BY 1),
             |s2 AS (SELECT e.user_id, s1.t_view,
             |    min(CASE WHEN event_type = 'click' AND e.ts > s1.t_view
             |        THEN e.ts END) AS t_click
             |  FROM e JOIN s1 USING (user_id) GROUP BY 1, 2),
             |s3 AS (SELECT e.user_id, s2.t_view, s2.t_click,
             |    min(CASE WHEN event_type = 'purchase' AND e.ts > s2.t_click
             |        THEN e.ts END) AS t_purchase
             |  FROM e JOIN s2 USING (user_id) GROUP BY 1, 2, 3)
             |SELECT user_id, t_view, t_click, t_purchase,
             |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
             |    WHEN t_click IS NOT NULL THEN 2
             |    WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
             |    AS steps_reached
             |FROM s3""".stripMargin)),

    // cohort retention matrix: users grouped by first-activity day, counted
    // per (cohort_day, day_offset) from their distinct active days — two
    // map-side-combinable aggregations on user id, the standard
    // product-analytics retention shape.
    Q("cohort_retention",
      (s, dir) => {
        val days = events(s, dir)
          .select(col("user_id"), expr("ts div 86400000000000").as("day"))
          .distinct()
        val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
        days.join(cohort, "user_id")
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
          .agg(countDistinct("user_id").as("n_users"))
      },
      Some("""WITH d AS (
             |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
             |  FROM events),
             |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
             |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
             |  count(DISTINCT d.user_id) AS n_users
             |FROM d JOIN c USING (user_id)
             |GROUP BY 1, 2""".stripMargin)),

    // per-user event-sequence transition counts (the Markov-chain view of
    // a clickstream): lag over (user, time) windows — partitioned by the
    // high-cardinality user id, never global — then one count aggregation
    // per (from, to) pair; event_id breaks timestamp ties deterministically.
    Q("event_transitions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, dir).select(col("user_id"), col("event_type"),
            col("ts"), col("event_id"))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type").as("from_type"),
            col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_type
             |  FROM events)
             |SELECT prev_type AS from_type, event_type AS to_type,
             |  count(*) AS n
             |FROM o WHERE prev_type IS NOT NULL
             |GROUP BY 1, 2""".stripMargin)),

    // robust (median/MAD) outlier flags per event type — the Hampel-style
    // robust alternative to mean/σ trims: exact lower-median via the
    // histogram-cumulative pattern (windows over distinct-value rows, not
    // data rows), MAD from a second histogram over |x − med|, flag at
    // |x − med| > 3·1.4826·MAD. Doubles group exactly — both engines read
    // identical bits from the same parquet.
    Q("robust_outliers",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir).select("event_id", "event_type", "value")
        def lowerMedian(df: org.apache.spark.sql.DataFrame, vCol: String,
                        outCol: String) = {
          val hist = df.groupBy("event_type", vCol).agg(count(lit(1)).as("c"))
          val byVal = Window.partitionBy("event_type").orderBy(vCol)
          val all = Window.partitionBy("event_type")
          hist.withColumn("cum", sum("c").over(byVal))
            .withColumn("n", sum("c").over(all))
            .groupBy("event_type")
            .agg(min(when(lit(2) * col("cum") >= col("n"), col(vCol)))
              .as(outCol))
        }
        val med = lowerMedian(ev, "value", "med")
        val dev = ev.join(med, "event_type")
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = lowerMedian(dev, "adev", "mad")
        dev.join(mad, "event_type")
          .select(col("event_id"), col("event_type"), col("value"),
            round(col("adev"), 8).as("abs_dev"),
            (col("adev") > lit(3.0) * lit(1.4826) * col("mad")).cast("int")
              .as("is_outlier"))
      },
      Some("""WITH h AS (SELECT event_type, value, count(*) AS c FROM events
             |  GROUP BY 1, 2),
             |cu AS (SELECT event_type, value, c,
             |    sum(c) OVER (PARTITION BY event_type ORDER BY value) AS cum,
             |    sum(c) OVER (PARTITION BY event_type) AS n FROM h),
             |med AS (SELECT event_type,
             |    min(CASE WHEN 2 * cum >= n THEN value END) AS med
             |  FROM cu GROUP BY 1),
             |dv AS (SELECT e.event_id, e.event_type, e.value,
             |    abs(e.value - m.med) AS adev
             |  FROM events e JOIN med m USING (event_type)),
             |h2 AS (SELECT event_type, adev, count(*) AS c FROM dv GROUP BY 1, 2),
             |cu2 AS (SELECT event_type, adev, c,
             |    sum(c) OVER (PARTITION BY event_type ORDER BY adev) AS cum,
             |    sum(c) OVER (PARTITION BY event_type) AS n FROM h2),
             |mad AS (SELECT event_type,
             |    min(CASE WHEN 2 * cum >= n THEN adev END) AS mad
             |  FROM cu2 GROUP BY 1)
             |SELECT dv.event_id, dv.event_type, dv.value,
             |  round(dv.adev, 8) AS abs_dev,
             |  CAST(dv.adev > 3.0 * 1.4826 * mad.mad AS INTEGER) AS is_outlier
             |FROM dv JOIN mad USING (event_type)""".stripMargin)),

    // distribution drift, reference window (Jan 1–15) vs current window
    // (Jan 16–30), per event type: binned two-sample KS statistic —
    // max |F_a − F_b| over a fixed 64-bin equi-width grid (integer cents
    // binning from a 1-row extent broadcast; D kept as the integer
    // max |cum_a·n_b − cum_b·n_a| until ONE final division, so both
    // engines agree bit-for-bit). Binned ECDF is the scale form: exact KS
    // needs a data-sized total order; ≤64 grid rows per type is O(1).
    Q("drift_ks",
      (s, dir) => Drift.binnedKs(events(s, dir), "event_type", "value",
        col("ts") < 1705363200000000000L, col("ts") >= 1705363200000000000L),
      Some("""WITH c AS (
             |  SELECT event_type AS g, CAST(round(value*100) AS BIGINT) AS c,
             |    CASE WHEN epoch_ns(ts) < 1705363200000000000 THEN 1 ELSE 0 END AS a,
             |    CASE WHEN epoch_ns(ts) >= 1705363200000000000 THEN 1 ELSE 0 END AS b
             |  FROM events),
             |x AS (SELECT min(c) AS mn, max(c) - min(c) + 1 AS span FROM c),
             |h AS (SELECT g, ((c - mn) * 64) // span AS bin,
             |    CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
             |  FROM c, x GROUP BY 1, 2),
             |cu AS (SELECT g, ca, cb,
             |    sum(ca) OVER (PARTITION BY g ORDER BY bin) AS cuma,
             |    sum(cb) OVER (PARTITION BY g ORDER BY bin) AS cumb,
             |    sum(ca) OVER (PARTITION BY g) AS na,
             |    sum(cb) OVER (PARTITION BY g) AS nb
             |  FROM h)
             |SELECT g AS event_type,
             |  CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             |  CAST(max(abs(cuma*nb - cumb*na)) AS BIGINT) AS ks_num,
             |  round(CAST(max(abs(cuma*nb - cumb*na)) AS DOUBLE)
             |        / CAST(max(na) * max(nb) AS DOUBLE), 9) AS ks
             |FROM cu GROUP BY 1""".stripMargin)),

    // Population Stability Index over the same reference/current split and
    // grid: Σ (p−q)·ln(p/q) with add-one-smoothed bin probabilities (the
    // full 64-bin grid generated explicitly — absent bins still
    // contribute under smoothing). ln terms follow the repo's
    // round-9-then-DECIMAL(20,9) order-free summation discipline.
    Q("drift_psi",
      (s, dir) => Drift.psi(events(s, dir), "event_type", "value",
        col("ts") < 1705363200000000000L, col("ts") >= 1705363200000000000L),
      Some("""WITH c AS (
             |  SELECT event_type AS g, CAST(round(value*100) AS BIGINT) AS c,
             |    CASE WHEN epoch_ns(ts) < 1705363200000000000 THEN 1 ELSE 0 END AS a,
             |    CASE WHEN epoch_ns(ts) >= 1705363200000000000 THEN 1 ELSE 0 END AS b
             |  FROM events),
             |x AS (SELECT min(c) AS mn, max(c) - min(c) + 1 AS span FROM c),
             |h AS (SELECT g, ((c - mn) * 64) // span AS bin,
             |    CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
             |  FROM c, x GROUP BY 1, 2),
             |tot AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
             |    CAST(sum(cb) AS BIGINT) AS nb FROM h GROUP BY 1),
             |grid AS (SELECT g, na, nb, unnest(generate_series(0, 63)) AS bin
             |  FROM tot),
             |fl AS (SELECT grid.g, grid.na, grid.nb,
             |    coalesce(h.ca, 0) AS ca, coalesce(h.cb, 0) AS cb
             |  FROM grid LEFT JOIN h ON grid.g = h.g AND grid.bin = h.bin),
             |t AS (SELECT g, na, nb,
             |    CAST(round((CAST(ca+1 AS DOUBLE)/CAST(na+64 AS DOUBLE)
             |          - CAST(cb+1 AS DOUBLE)/CAST(nb+64 AS DOUBLE))
             |        * ln((CAST(ca+1 AS DOUBLE)/CAST(na+64 AS DOUBLE))
             |            / (CAST(cb+1 AS DOUBLE)/CAST(nb+64 AS DOUBLE))), 9)
             |      AS DECIMAL(20,9)) AS term
             |  FROM fl)
             |SELECT g AS event_type, max(na) AS n_a, max(nb) AS n_b,
             |  CAST(sum(term) AS DOUBLE) AS psi
             |FROM t GROUP BY 1""".stripMargin)),

    // PSI over FIXED-grid histogram registers — the deployment form of
    // drift_psi: reference registers built once from the training window,
    // current registers accumulate under streaming (StreamDriftSpec
    // proves register parity) or merge from shards by adding counts; the
    // comparison is a register-level fold. Edges clamp to the fixed grid.
    Q("drift_psi_fixed",
      (s, dir) => {
        val ev = events(s, dir)
        def regs(side: org.apache.spark.sql.Column) =
          graft.ops.Sketches.histRegisters(
            ev.filter(side).select(col("event_type"), col("value")),
            "event_type", "value", minCents = 1L, span = 49002L, bins = 64)
        Drift.psiFromRegisters(
          regs(col("ts") < 1705363200000000000L),
          regs(col("ts") >= 1705363200000000000L), "event_type", bins = 64)
      },
      Some("""WITH c AS (
             |  SELECT event_type AS g, CAST(round(value*100) AS BIGINT) AS c,
             |    CASE WHEN epoch_ns(ts) < 1705363200000000000
             |      THEN 0 ELSE 1 END AS side
             |  FROM events),
             |h AS (SELECT g,
             |    least(greatest(((c - 1) * 64) // 49002, 0), 63) AS b,
             |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM c GROUP BY 1, 2),
             |tot AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
             |    CAST(sum(cb) AS BIGINT) AS nb FROM h GROUP BY 1),
             |grid AS (SELECT g, na, nb, unnest(generate_series(0, 63)) AS bin
             |  FROM tot),
             |fl AS (SELECT grid.g, grid.na, grid.nb,
             |    coalesce(h.ca, 0) AS ca, coalesce(h.cb, 0) AS cb
             |  FROM grid LEFT JOIN h ON grid.g = h.g AND grid.bin = h.b),
             |t AS (SELECT g, na, nb,
             |    CAST(round((CAST(ca+1 AS DOUBLE)/CAST(na+64 AS DOUBLE)
             |          - CAST(cb+1 AS DOUBLE)/CAST(nb+64 AS DOUBLE))
             |        * ln((CAST(ca+1 AS DOUBLE)/CAST(na+64 AS DOUBLE))
             |            / (CAST(cb+1 AS DOUBLE)/CAST(nb+64 AS DOUBLE))), 9)
             |      AS DECIMAL(20,9)) AS term
             |  FROM fl)
             |SELECT g AS event_type, max(na) AS n_a, max(nb) AS n_b,
             |  CAST(sum(term) AS DOUBLE) AS psi
             |FROM t GROUP BY 1""".stripMargin)),

    // binned KS over the same fixed-grid registers — with drift_psi_fixed
    // this is the register-level monitoring pair (PSI = magnitude of
    // shift, KS = worst-point ECDF gap); integer numerator to the end.
    Q("drift_ks_fixed",
      (s, dir) => {
        val ev = events(s, dir)
        def regs(side: org.apache.spark.sql.Column) =
          graft.ops.Sketches.histRegisters(
            ev.filter(side).select(col("event_type"), col("value")),
            "event_type", "value", minCents = 1L, span = 49002L, bins = 64)
        Drift.ksFromRegisters(
          regs(col("ts") < 1705363200000000000L),
          regs(col("ts") >= 1705363200000000000L), "event_type")
      },
      Some("""WITH c AS (
             |  SELECT event_type AS g, CAST(round(value*100) AS BIGINT) AS c,
             |    CASE WHEN epoch_ns(ts) < 1705363200000000000
             |      THEN 0 ELSE 1 END AS side
             |  FROM events),
             |h AS (SELECT g,
             |    least(greatest(((c - 1) * 64) // 49002, 0), 63) AS b,
             |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM c GROUP BY 1, 2),
             |cu AS (SELECT g, ca, cb,
             |    sum(ca) OVER (PARTITION BY g ORDER BY b) AS cuma,
             |    sum(cb) OVER (PARTITION BY g ORDER BY b) AS cumb,
             |    sum(ca) OVER (PARTITION BY g) AS na,
             |    sum(cb) OVER (PARTITION BY g) AS nb
             |  FROM h)
             |SELECT g AS event_type,
             |  CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             |  CAST(max(abs(cuma*nb - cumb*na)) AS BIGINT) AS ks_num,
             |  round(CAST(max(abs(cuma*nb - cumb*na)) AS DOUBLE)
             |        / CAST(max(na) * max(nb) AS DOUBLE), 9) AS ks
             |FROM cu GROUP BY 1""".stripMargin)),

    // bootstrap CI for the per-type mean value — DETERMINISTIC
    // Poisson-style bootstrap: replicate weights w ~ Binomial(8, 1/8)
    // from one md5 per (row, replicate) via exact integer inverse-CDF
    // thresholds (denominator 8^8); both engines draw the SAME resamples
    // so the interval itself is oracle-checked. Replicate means are
    // single divisions of exact cent sums; moments via round-9 DECIMALs.
    Q("bootstrap_ci",
      (s, dir) => Drift.bootstrapMeanCi(events(s, dir), "event_type",
        "event_id", "value", reps = 32),
      Some("""WITH r AS (
             |  SELECT event_type AS g, CAST(round(value*100) AS BIGINT) AS c,
             |    CAST(event_id AS VARCHAR) || '_' || CAST(b AS VARCHAR) AS hid
             |  FROM events, (SELECT unnest(generate_series(0, 31)) AS b)),
             |u AS (SELECT g, c, hid,
             |    CAST(('0x' || substr(md5(hid), 1, 15)) AS BIGINT) % 16777216 AS u
             |  FROM r),
             |w AS (SELECT g, c, hid,
             |    CASE WHEN u < 5764801 THEN 0 WHEN u < 12353145 THEN 1
             |         WHEN u < 15647317 THEN 2 WHEN u < 16588509 THEN 3
             |         WHEN u < 16756579 THEN 4 WHEN u < 16775787 THEN 5
             |         WHEN u < 16777159 THEN 6 WHEN u < 16777215 THEN 7
             |         ELSE 8 END AS w
             |  FROM u),
             |rm AS (SELECT g, split_part(hid, '_', 2) AS b,
             |    round(CAST(sum(w*c) AS DOUBLE)
             |      / (100.0 * CAST(sum(w) AS DOUBLE)), 9) AS m
             |  FROM w GROUP BY 1, 2 HAVING sum(w) > 0),
             |st AS (SELECT g, CAST(count(*) AS BIGINT) AS nb,
             |    CAST(sum(CAST(m AS DECIMAL(24,9))) AS DOUBLE) AS sm,
             |    CAST(sum(CAST(round(m*m, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sm2
             |  FROM rm GROUP BY 1),
             |base AS (SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n_rows,
             |    round(CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
             |      / (100.0 * count(*)), 9) AS mean
             |  FROM events GROUP BY 1)
             |SELECT base.g AS event_type, n_rows, mean,
             |  round(sqrt((sm2 - sm*sm/nb)/(nb-1)), 9) AS se_boot,
             |  round(mean - 2.0 * round(sqrt((sm2 - sm*sm/nb)/(nb-1)), 9), 9)
             |    AS ci_lo,
             |  round(mean + 2.0 * round(sqrt((sm2 - sm*sm/nb)/(nb-1)), 9), 9)
             |    AS ci_hi
             |FROM st JOIN base ON st.g = base.g""".stripMargin)),

    // two-sided CUSUM changepoint scores over daily counts per type
    // (Page 1954): a persistent level shift accumulates where a one-day
    // spike decays. Integer recursion in deviation-numerator units
    // (n_days·x_t − total, so the rational mean never becomes a float);
    // the oracle replays it as a recursive CTE over row-numbered days.
    Q("cusum_daily",
      (s, dir) => Drift.cusumDaily(events(s, dir), "event_type", "ts"),
      Some("""WITH RECURSIVE d AS (
             |  SELECT event_type AS g, epoch_ns(ts) // 86400000000000 AS day,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS total,
             |    CAST(count(*) AS BIGINT) AS nd FROM d GROUP BY 1),
             |r AS (SELECT g, day, cnt,
             |    row_number() OVER (PARTITION BY g ORDER BY day) AS rn FROM d),
             |c AS (
             |  SELECT r.g, r.day, r.cnt, r.rn,
             |    greatest(CAST(0 AS BIGINT), t.nd*r.cnt - t.total) AS sp,
             |    greatest(CAST(0 AS BIGINT), -(t.nd*r.cnt - t.total)) AS sn
             |  FROM r JOIN t USING (g) WHERE r.rn = 1
             |  UNION ALL
             |  SELECT r.g, r.day, r.cnt, r.rn,
             |    greatest(CAST(0 AS BIGINT), c.sp + (t.nd*r.cnt - t.total)),
             |    greatest(CAST(0 AS BIGINT), c.sn - (t.nd*r.cnt - t.total))
             |  FROM c JOIN r ON r.g = c.g AND r.rn = c.rn + 1
             |  JOIN t ON t.g = r.g)
             |SELECT c.g AS event_type, c.day, c.cnt AS n_events,
             |  c.sp AS cusum_pos, c.sn AS cusum_neg,
             |  CAST(c.sp > t.total OR c.sn > t.total AS INTEGER) AS alarm
             |FROM c JOIN t ON t.g = c.g""".stripMargin)),

    // snapshot reconciliation: added/removed/changed/unchanged diff report
    // between two keyed snapshots (pipeline-version validation). Snapshot A
    // = orders as of 1997-07-01; snapshot B = current orders with
    // deterministic simulated updates (price correction on keys ≡ 0 mod 97)
    // and deletes (keys ≡ 1 mod 1000). One full-outer join on the key;
    // Spark classifies via a null-safe md5 row fingerprint, the oracle via
    // direct IS DISTINCT FROM column compares — same classes.
    Q("snapshot_diff",
      (s, dir) => {
        val o = orders(s, dir)
        val snapA = o.filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        val snapB = o.filter(col("o_orderkey") % 1000 =!= 1)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
        graft.ops.Reconcile.snapshotDiff(snapA, snapB, "o_orderkey",
          Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
      },
      Some("""WITH a AS (
             |  SELECT o_orderkey AS k, o_custkey, o_orderstatus, o_totalprice,
             |    o_orderpriority
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01'),
             |b AS (
             |  SELECT o_orderkey AS k, o_custkey, o_orderstatus,
             |    CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
             |         ELSE o_totalprice END AS o_totalprice,
             |    o_orderpriority
             |  FROM orders WHERE o_orderkey % 1000 <> 1),
             |j AS (
             |  SELECT coalesce(a.k, b.k) AS k,
             |    CASE WHEN a.k IS NULL THEN 'added'
             |         WHEN b.k IS NULL THEN 'removed'
             |         WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
             |           OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
             |           OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
             |           OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
             |           THEN 'changed'
             |         ELSE 'unchanged' END AS diff_class
             |  FROM a FULL OUTER JOIN b ON a.k = b.k)
             |SELECT diff_class, count(*) AS n_rows,
             |  min(k) AS min_key, max(k) AS max_key
             |FROM j GROUP BY 1""".stripMargin)),

    // event-time interval join: view → purchase within 1 hour per user —
    // the stream-stream join shape (both sides watermarked; the SAME
    // function streams in StreamIntervalJoinSpec, withWatermark being a
    // batch no-op). Equi-key on user carries the shuffle; the range
    // predicate bounds streaming state. µs arithmetic end-to-end.
    Q("interval_join",
      (s, dir) => {
        val ev = events(s, dir).select(col("user_id"), col("event_id"),
          col("event_type"),
          timestamp_micros(expr("ts div 1000")).as("event_time"))
        graft.streaming.StreamIntervalJoin.viewToConversion(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"))
      },
      Some("""SELECT v.user_id, v.event_id AS view_id,
             |  p.event_id AS purchase_id,
             |  (epoch_us(p.ts) - epoch_us(v.ts)) // 1000 AS lag_ms
             |FROM events v JOIN events p ON v.user_id = p.user_id
             |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
             |  AND epoch_us(p.ts) > epoch_us(v.ts)
             |  AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000""".stripMargin)),

    // classical additive seasonal decomposition of daily counts per type
    // (STL-lite): centered 7-day moving-average trend, per-weekday
    // seasonal means, residual — all numerators carried ×7 in integers
    // (det7 = 7·cnt − Σ7) down to single double divisions, so both
    // engines agree bit-for-bit. Windows span ≤7 rows; seasonal state is
    // 7 slots per type.
    Q("seasonal_decompose",
      (s, dir) => Drift.seasonalDecompose(events(s, dir), "event_type", "ts"),
      Some("""WITH d AS (
             |  SELECT event_type AS g, epoch_ns(ts) // 86400000000000 AS day,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |t AS (
             |  SELECT g, day, cnt,
             |    sum(cnt) OVER (PARTITION BY g ORDER BY day
             |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7,
             |    count(*) OVER (PARTITION BY g ORDER BY day
             |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nw
             |  FROM d),
             |t2 AS (SELECT *, CASE WHEN nw = 7 THEN 7*cnt - t7 END AS det7,
             |    day % 7 AS wd FROM t),
             |s AS (SELECT g, wd, CAST(sum(det7) AS BIGINT) AS s7,
             |    CAST(count(*) AS BIGINT) AS sn
             |  FROM t2 WHERE det7 IS NOT NULL GROUP BY 1, 2)
             |SELECT t2.g AS event_type, t2.day, t2.cnt AS n_events,
             |  CASE WHEN nw = 7 THEN round(CAST(t7 AS DOUBLE)/7.0, 9) END AS trend,
             |  CASE WHEN det7 IS NOT NULL THEN
             |    round(CAST(s7 AS DOUBLE)/CAST(7*sn AS DOUBLE), 9) END AS seasonal,
             |  CASE WHEN det7 IS NOT NULL THEN
             |    round(CAST(det7*sn - s7 AS DOUBLE)/CAST(7*sn AS DOUBLE), 9)
             |    END AS residual
             |FROM t2 LEFT JOIN s ON t2.g = s.g AND t2.wd = s.wd""".stripMargin)),

    // conversion-lag quantiles: median/p90 view→purchase delay PER
    // VIEW-HOUR-OF-DAY (when do users convert fastest?), through the
    // mergeable histogram-sketch machinery — lag_ms IS the cents unit so
    // the sketch grid is exact; hour groups give the windows real
    // partitions.
    Q("conversion_lag_quantiles",
      (s, dir) => {
        val ev = events(s, dir).select(col("user_id"), col("event_id"),
          col("event_type"), col("ts"),
          timestamp_micros(expr("ts div 1000")).as("event_time"))
        val lags = graft.streaming.StreamIntervalJoin.viewToConversion(
            ev.filter(col("event_type") === "view")
              .withColumn("event_id",
                // pack the view hour into the id's high bits so it rides
                // through the join without widening its schema
                col("event_id") * 32 + expr("(ts div 3600000000000) % 24")),
            ev.filter(col("event_type") === "purchase"))
          .select((col("lag_ms").cast("double") / 100.0).as("value"),
            pmod(col("view_id"), lit(32)).cast("int").as("grp"))
        graft.ops.Sketches.histQuantile(lags, "grp", "value")
      },
      Some("""WITH j AS (
             |  SELECT CAST((epoch_ns(v.ts) // 3600000000000) % 24 AS INTEGER)
             |    AS grp,
             |    (epoch_us(p.ts) - epoch_us(v.ts)) // 1000 AS c
             |  FROM events v JOIN events p ON v.user_id = p.user_id
             |  WHERE v.event_type = 'view' AND p.event_type = 'purchase'
             |    AND epoch_us(p.ts) > epoch_us(v.ts)
             |    AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000),
             |x AS (SELECT min(c) AS mn, max(c) - min(c) + 1 AS span FROM j),
             |sk AS (
             |  SELECT grp, mn, span, ((c - mn) * 64) // span AS b,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM j, x GROUP BY 1, 2, 3, 4),
             |cu AS (
             |  SELECT *, CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY b)
             |      AS BIGINT) AS cum,
             |    CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
             |  FROM sk),
             |qs AS (SELECT * FROM (VALUES ('q50', CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
             |                             ('q90', CAST(9 AS BIGINT), CAST(10 AS BIGINT)))
             |       t(q, num, den)),
             |sel AS (
             |  SELECT grp, q,
             |    mn + (b * span) // 64
             |       + ((target - (cum - cnt)) * span) // (64 * cnt) AS est_cents,
             |    row_number() OVER (PARTITION BY grp, q ORDER BY b) AS rn
             |  FROM (SELECT cu.*, qs.q, (qs.num * cu.n + qs.den - 1) // qs.den AS target
             |        FROM cu, qs) WHERE cum >= target),
             |st AS (
             |  SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_rows,
             |    CAST(count(*) AS INTEGER) AS n_bins_used
             |  FROM sk GROUP BY 1)
             |SELECT st.grp, st.n_rows, st.n_bins_used,
             |  CAST(max(CASE WHEN q = 'q50' THEN est_cents END) AS DOUBLE) / 100.0
             |    AS q50_est,
             |  CAST(max(CASE WHEN q = 'q90' THEN est_cents END) AS DOUBLE) / 100.0
             |    AS q90_est
             |FROM st JOIN (SELECT * FROM sel WHERE rn = 1) s ON s.grp = st.grp
             |GROUP BY 1, 2, 3""".stripMargin)),

    // LEFT OUTER event-time interval join — "did this impression convert
    // at all?": same watermarked plan streams (null rows emitted on
    // watermark closure — StreamIntervalJoinSpec), batch emits them
    // immediately.
    Q("interval_join_outer",
      (s, dir) => {
        val ev = events(s, dir).select(col("user_id"), col("event_id"),
          col("event_type"),
          timestamp_micros(expr("ts div 1000")).as("event_time"))
        graft.streaming.StreamIntervalJoin.viewToConversionOuter(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"))
      },
      Some("""SELECT v.user_id, v.event_id AS view_id,
             |  p.event_id AS purchase_id,
             |  (epoch_us(p.ts) - epoch_us(v.ts)) // 1000 AS lag_ms,
             |  CAST(p.event_id IS NOT NULL AS INTEGER) AS converted
             |FROM (SELECT * FROM events WHERE event_type = 'view') v
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON v.user_id = p.user_id
             |  AND epoch_us(p.ts) > epoch_us(v.ts)
             |  AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000""".stripMargin)),

    // Holt double-exponential forecast (level+trend, α=β=1/4) over daily
    // counts — the forecasting companion to ewma_anomaly: state carried
    // in integer millionths with floor division each step (both engines
    // replay the identical sequence), one-step-ahead backtest errors ride
    // along, and 7 horizon rows extrapolate l+h·b past the data.
    Q("holt_forecast",
      (s, dir) => Drift.holtForecast(events(s, dir), "event_type", "ts"),
      Some("""WITH RECURSIVE d AS (
             |  SELECT event_type AS g, epoch_ns(ts) // 86400000000000 AS day,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |r AS (SELECT g, day, cnt,
             |    row_number() OVER (PARTITION BY g ORDER BY day) AS rn FROM d),
             |n AS (SELECT g, CAST(max(rn) AS BIGINT) AS nr FROM r GROUP BY 1),
             |h AS (
             |  SELECT r2.g, CAST(2 AS BIGINT) AS rn,
             |    CAST(r2.cnt * 1000000 AS BIGINT) AS l,
             |    CAST((r2.cnt - r1.cnt) * 1000000 AS BIGINT) AS b
             |  FROM r r2 JOIN r r1 ON r1.g = r2.g AND r1.rn = 1
             |  WHERE r2.rn = 2
             |  UNION ALL
             |  SELECT r.g, r.rn,
             |    (r.cnt * 1000000 + 3 * (h.l + h.b)) // 4,
             |    (((r.cnt * 1000000 + 3 * (h.l + h.b)) // 4 - h.l) + 3 * h.b) // 4
             |  FROM h JOIN r ON r.g = h.g AND r.rn = h.rn + 1),
             |out1 AS (
             |  SELECT r.g, r.day, r.cnt, h.l AS l, h.b AS b,
             |    CASE WHEN r.rn >= 3 THEN hp.l + hp.b END AS f
             |  FROM r LEFT JOIN h ON h.g = r.g AND h.rn = r.rn
             |  LEFT JOIN h hp ON hp.g = r.g AND hp.rn = r.rn - 1),
             |lastc AS (SELECT h.g, h.l, h.b
             |  FROM h JOIN n ON n.g = h.g AND h.rn = n.nr),
             |md AS (SELECT g, max(day) AS mx FROM d GROUP BY 1),
             |hor AS (SELECT lastc.g, md.mx + gs.h AS day,
             |    CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS BIGINT) AS l,
             |    CAST(NULL AS BIGINT) AS b, lastc.l + gs.h * lastc.b AS f
             |  FROM lastc JOIN md ON md.g = lastc.g, generate_series(1, 7) gs(h))
             |SELECT g AS event_type, day, cnt AS n_events,
             |  round(CAST(l AS DOUBLE)/1e6, 6) AS level,
             |  round(CAST(b AS DOUBLE)/1e6, 6) AS trend,
             |  round(CAST(f AS DOUBLE)/1e6, 6) AS forecast,
             |  CASE WHEN f IS NOT NULL AND cnt IS NOT NULL THEN
             |    round(abs(CAST(cnt AS DOUBLE) - CAST(f AS DOUBLE)/1e6), 6)
             |  END AS abs_err
             |FROM (SELECT * FROM out1 UNION ALL SELECT * FROM hor)""".stripMargin)),

    // Kaplan-Meier churn/retention curve over user lifetimes: churned at
    // last-active age unless still active on the window's final day
    // (right-censored). Day-bounded fold; survival = exp of a running
    // round-9 ln sum, pinned to exactly 0 past any n_risk = d step.
    Q("survival_km",
      (s, dir) => Drift.kaplanMeier(events(s, dir), "user_id", "ts"),
      Some("""WITH d0 AS (SELECT user_id,
             |    min(epoch_ns(ts) // 86400000000000) AS fd,
             |    max(epoch_ns(ts) // 86400000000000) AS ld
             |  FROM events GROUP BY 1),
             |w AS (SELECT max(ld) AS wend, CAST(count(*) AS BIGINT) AS nu
             |  FROM d0),
             |u AS (SELECT ld - fd AS lt,
             |    CASE WHEN ld < wend THEN 1 ELSE 0 END AS ch FROM d0, w),
             |t AS (SELECT lt, CAST(sum(ch) AS BIGINT) AS d,
             |    CAST(count(*) - sum(ch) AS BIGINT) AS c FROM u GROUP BY 1),
             |n AS (SELECT t.lt, t.d, t.c,
             |    w.nu - CAST(coalesce(sum(t.d + t.c) OVER (ORDER BY t.lt
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS nr
             |  FROM t, w),
             |s AS (SELECT lt, d, c, nr,
             |    sum(CASE WHEN d < nr THEN
             |        CAST(round(ln(CAST(nr - d AS DOUBLE)
             |          / CAST(nr AS DOUBLE)), 9) AS DECIMAL(20,9))
             |      ELSE CAST(0 AS DECIMAL(20,9)) END)
             |      OVER (ORDER BY lt) AS lns,
             |    max(CASE WHEN d >= nr THEN 1 ELSE 0 END)
             |      OVER (ORDER BY lt) AS dead
             |  FROM n)
             |SELECT lt AS t_days, nr AS n_risk, d AS n_churn,
             |  c AS n_censored,
             |  CASE WHEN dead = 1 THEN 0.0
             |    ELSE round(exp(CAST(lns AS DOUBLE)), 9) END AS survival
             |FROM s""".stripMargin)),

    // per-user lag-1 autocorrelation of the value series (time-series QC:
    // white-noise vs drifting sensors): user-partitioned position windows,
    // every cross term quantized to DECIMAL(25,9) before the sum — exact,
    // order-free addition, bit-identical r1 across engines
    Q("value_autocorr",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val ev = events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("pos", row_number().over(w))
        val mean = ev.groupBy("user_id").agg(
          Exact.avg(col("value")).as("xbar"), count(lit(1)).as("n"))
        val d = ev.join(mean, "user_id")
          .withColumn("dev", col("value") - col("xbar"))
        val denom = d.groupBy("user_id").agg(
          sum(round(col("dev") * col("dev"), 9).cast("decimal(25,9)"))
            .cast("double").as("ss"))
        val nxt = d.select(col("user_id"), (col("pos") - 1).as("pos"),
          col("dev").as("dev1"))
        val num = d.join(nxt, Seq("user_id", "pos"))
          .groupBy("user_id").agg(
            sum(round(col("dev") * col("dev1"), 9).cast("decimal(25,9)"))
              .cast("double").as("sc"))
        mean.join(denom, "user_id").join(num, Seq("user_id"), "left")
          .select(col("user_id"), col("n"),
            round(coalesce(col("sc"), lit(0.0)) /
              when(col("ss") > 0, col("ss")), 8).as("r1"))
      },
      Some(s"""WITH o AS (
             |  SELECT user_id, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS pos
             |  FROM events),
             |m AS (SELECT user_id, ${Exact.avgSql("value")} AS xbar,
             |    count(*) AS n FROM events GROUP BY 1),
             |d AS (SELECT o.user_id, o.pos, o.value - m.xbar AS dev
             |  FROM o JOIN m USING (user_id)),
             |den AS (SELECT user_id,
             |    CAST(sum(CAST(round(dev * dev, 9) AS DECIMAL(25,9))) AS DOUBLE)
             |      AS ss
             |  FROM d GROUP BY 1),
             |nu AS (SELECT a.user_id,
             |    CAST(sum(CAST(round(a.dev * b.dev, 9) AS DECIMAL(25,9))) AS DOUBLE)
             |      AS sc
             |  FROM d a JOIN d b ON a.user_id = b.user_id AND b.pos = a.pos + 1
             |  GROUP BY 1)
             |SELECT m.user_id, m.n,
             |  round(coalesce(nu.sc, 0.0) /
             |    (CASE WHEN den.ss > 0 THEN den.ss END), 8) AS r1
             |FROM m JOIN den USING (user_id)
             |LEFT JOIN nu USING (user_id)""".stripMargin)),

    // A/B experiment readout (variant = user hash parity): per-variant
    // user and converter counts from exact integer aggregation, conversion
    // rates and the pooled two-proportion z-statistic as single fixed-order
    // double expressions (rounded) — the canonical experimentation report,
    // one row, computed without any approximation
    Q("ab_test_report",
      (s, dir) => {
        val conv = events(s, dir)
          .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
          .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("converted"))
        conv.groupBy("variant")
          .agg(count(lit(1)).as("n_users"), sum("converted").as("n_conv"))
          .groupBy()
          .agg(
            sum(when(col("variant") === 0, col("n_users"))).as("n_a"),
            sum(when(col("variant") === 0, col("n_conv"))).as("conv_a"),
            sum(when(col("variant") === 1, col("n_users"))).as("n_b"),
            sum(when(col("variant") === 1, col("n_conv"))).as("conv_b"))
          .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
            round(col("conv_a").cast("double") / col("n_a"), 8).as("rate_a"),
            round(col("conv_b").cast("double") / col("n_b"), 8).as("rate_b"),
            // degenerate pooled rates (0 or 1) have zero variance — the
            // z-statistic is undefined, and ANSI mode rightly refuses the
            // division: emit null instead
            when(col("conv_a") + col("conv_b") > 0 &&
                 col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
              round(
                (col("conv_b").cast("double") / col("n_b") -
                 col("conv_a").cast("double") / col("n_a")) /
                sqrt(((col("conv_a") + col("conv_b")).cast("double") /
                      (col("n_a") + col("n_b"))) *
                     (lit(1.0) - (col("conv_a") + col("conv_b")).cast("double") /
                      (col("n_a") + col("n_b"))) *
                     (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 8))
              .as("z_stat"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, user_id % 2 AS variant,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS converted
             |  FROM events GROUP BY 1, 2),
             |v AS (SELECT variant, count(*) AS n_users,
             |    sum(converted) AS n_conv FROM c GROUP BY 1),
             |w AS (SELECT
             |    sum(CASE WHEN variant = 0 THEN n_users END) AS n_a,
             |    sum(CASE WHEN variant = 0 THEN n_conv END) AS conv_a,
             |    sum(CASE WHEN variant = 1 THEN n_users END) AS n_b,
             |    sum(CASE WHEN variant = 1 THEN n_conv END) AS conv_b
             |  FROM v)
             |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
             |  CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
             |  round(CAST(conv_a AS DOUBLE) / n_a, 8) AS rate_a,
             |  round(CAST(conv_b AS DOUBLE) / n_b, 8) AS rate_b,
             |  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
             |  THEN round(
             |    (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a) /
             |    sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
             |         (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
             |         (1.0 / n_a + 1.0 / n_b)), 8) END AS z_stat
             |FROM w""".stripMargin)),

    // RFM customer segmentation: per-user recency/frequency/monetary from
    // ONE user-keyed aggregation (monetary as exact cents — no float sum),
    // quartile thresholds per metric via the distinct-value histogram +
    // cumulative-window pattern (bounded by distinct metric values, never
    // a user-sized global NTILE), scores + segment label as a pure
    // projection against the 1-row broadcast threshold table.
    Q("rfm_segments",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir).select(col("user_id"),
          expr("ts div 86400000000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        val maxDay = ev.agg(max("day").as("__maxd"))
        val perUser = ev.groupBy("user_id")
          .agg(max("day").as("__last"), count(lit(1)).as("frequency"),
            sum("cents").as("monetary_cents"))
          .crossJoin(broadcast(maxDay))
          .select(col("user_id"), (col("__maxd") - col("__last")).as("recency_days"),
            col("frequency"), col("monetary_cents"))
        val metrics = perUser.select(explode(array(
            struct(lit("r").as("m"), col("recency_days").as("v")),
            struct(lit("f").as("m"), col("frequency").as("v")),
            struct(lit("m").as("m"), col("monetary_cents").as("v")))).as("x"))
          .select(col("x.m").as("m"), col("x.v").as("v"))
        val hist = metrics.groupBy("m", "v").agg(count(lit(1)).as("c"))
        val byVal = Window.partitionBy("m").orderBy("v")
        val all = Window.partitionBy("m")
        val th = hist.withColumn("cum", sum("c").over(byVal))
          .withColumn("n", sum("c").over(all))
          .groupBy("m")
          .agg(min(when(col("cum") >= expr("(n + 3) div 4"), col("v"))).as("t25"),
            min(when(col("cum") >= expr("(n + 1) div 2"), col("v"))).as("t50"),
            min(when(col("cum") >= expr("(3 * n + 3) div 4"), col("v"))).as("t75"))
        val thRow = th.groupBy().agg(
          max(when(col("m") === "r", col("t25"))).as("r25"),
          max(when(col("m") === "r", col("t50"))).as("r50"),
          max(when(col("m") === "r", col("t75"))).as("r75"),
          max(when(col("m") === "f", col("t25"))).as("f25"),
          max(when(col("m") === "f", col("t50"))).as("f50"),
          max(when(col("m") === "f", col("t75"))).as("f75"),
          max(when(col("m") === "m", col("t25"))).as("m25"),
          max(when(col("m") === "m", col("t50"))).as("m50"),
          max(when(col("m") === "m", col("t75"))).as("m75"))
        val scored = perUser.crossJoin(broadcast(thRow))
          .select(col("user_id"), col("recency_days"), col("frequency"),
            col("monetary_cents"),
            (lit(1) + (col("recency_days") <= col("r25")).cast("int")
              + (col("recency_days") <= col("r50")).cast("int")
              + (col("recency_days") <= col("r75")).cast("int")).as("r_score"),
            (lit(1) + (col("frequency") > col("f25")).cast("int")
              + (col("frequency") > col("f50")).cast("int")
              + (col("frequency") > col("f75")).cast("int")).as("f_score"),
            (lit(1) + (col("monetary_cents") > col("m25")).cast("int")
              + (col("monetary_cents") > col("m50")).cast("int")
              + (col("monetary_cents") > col("m75")).cast("int")).as("m_score"))
        scored.withColumn("segment",
          when(col("r_score") === 4 && col("f_score") === 4, "champion")
            .when(col("r_score") >= 3 && col("f_score") >= 3, "loyal")
            .when(col("m_score") === 4 && col("r_score") >= 2, "big_spender")
            .when(col("r_score") === 1, "churned")
            .when(col("r_score") === 2, "at_risk")
            .otherwise("regular"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |mx AS (SELECT max(day) AS maxd FROM ev),
             |pu AS (
             |  SELECT user_id, mx.maxd - max(day) AS recency_days,
             |    CAST(count(*) AS BIGINT) AS frequency,
             |    CAST(sum(cents) AS BIGINT) AS monetary_cents
             |  FROM ev, mx GROUP BY user_id, mx.maxd),
             |mt AS (
             |  SELECT 'r' AS m, recency_days AS v FROM pu
             |  UNION ALL SELECT 'f', frequency FROM pu
             |  UNION ALL SELECT 'm', monetary_cents FROM pu),
             |h AS (SELECT m, v, count(*) AS c FROM mt GROUP BY 1, 2),
             |cw AS (
             |  SELECT m, v,
             |    CAST(sum(c) OVER (PARTITION BY m ORDER BY v) AS BIGINT) AS cum,
             |    CAST(sum(c) OVER (PARTITION BY m) AS BIGINT) AS n
             |  FROM h),
             |th AS (
             |  SELECT m,
             |    min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS t25,
             |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS t50,
             |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS t75
             |  FROM cw GROUP BY 1),
             |tr AS (SELECT
             |    max(CASE WHEN m = 'r' THEN t25 END) AS r25,
             |    max(CASE WHEN m = 'r' THEN t50 END) AS r50,
             |    max(CASE WHEN m = 'r' THEN t75 END) AS r75,
             |    max(CASE WHEN m = 'f' THEN t25 END) AS f25,
             |    max(CASE WHEN m = 'f' THEN t50 END) AS f50,
             |    max(CASE WHEN m = 'f' THEN t75 END) AS f75,
             |    max(CASE WHEN m = 'm' THEN t25 END) AS m25,
             |    max(CASE WHEN m = 'm' THEN t50 END) AS m50,
             |    max(CASE WHEN m = 'm' THEN t75 END) AS m75
             |  FROM th),
             |sc AS (
             |  SELECT user_id, recency_days, frequency, monetary_cents,
             |    CAST(1 + CAST(recency_days <= r25 AS INTEGER)
             |           + CAST(recency_days <= r50 AS INTEGER)
             |           + CAST(recency_days <= r75 AS INTEGER) AS INTEGER) AS r_score,
             |    CAST(1 + CAST(frequency > f25 AS INTEGER)
             |           + CAST(frequency > f50 AS INTEGER)
             |           + CAST(frequency > f75 AS INTEGER) AS INTEGER) AS f_score,
             |    CAST(1 + CAST(monetary_cents > m25 AS INTEGER)
             |           + CAST(monetary_cents > m50 AS INTEGER)
             |           + CAST(monetary_cents > m75 AS INTEGER) AS INTEGER) AS m_score
             |  FROM pu, tr)
             |SELECT *,
             |  CASE WHEN r_score = 4 AND f_score = 4 THEN 'champion'
             |    WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
             |    WHEN m_score = 4 AND r_score >= 2 THEN 'big_spender'
             |    WHEN r_score = 1 THEN 'churned'
             |    WHEN r_score = 2 THEN 'at_risk'
             |    ELSE 'regular' END AS segment
             |FROM sc""".stripMargin)),

    // daily trending event types: today's count vs the trailing-3-observed-
    // days baseline per type (rows window partitioned by type), lift in
    // exact integer millis (cnt·1000·n_prev div sum_prev), top-3 per day by
    // (lift desc, type) — the content-trending / anomaly-surfacing shape.
    Q("trending_topk",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = events(s, dir)
          .groupBy(expr("ts div 86400000000000").as("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val wPrev = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-3, -1)
        val withBase = daily
          .withColumn("sum_prev", sum("cnt").over(wPrev))
          .withColumn("n_prev", count(lit(1)).over(wPrev).cast("int"))
          .filter(col("n_prev") > 0)
          .withColumn("lift_millis",
            expr("(cnt * 1000 * n_prev) div sum_prev"))
        val wDay = Window.partitionBy("day")
          .orderBy(col("lift_millis").desc, col("event_type"))
        withBase.withColumn("rank", row_number().over(wDay).cast("int"))
          .filter(col("rank") <= 3)
          .select("day", "event_type", "cnt", "sum_prev", "n_prev",
            "lift_millis", "rank")
      },
      Some("""WITH d AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_type,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |b AS (
             |  SELECT day, event_type, cnt,
             |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
             |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT) AS sum_prev,
             |    CAST(count(cnt) OVER (PARTITION BY event_type ORDER BY day
             |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS INTEGER) AS n_prev
             |  FROM d),
             |l AS (
             |  SELECT *, (cnt * 1000 * n_prev) // sum_prev AS lift_millis
             |  FROM b WHERE n_prev > 0)
             |SELECT day, event_type, cnt, sum_prev, n_prev, lift_millis,
             |  CAST(rank AS INTEGER) AS rank
             |FROM (SELECT *, row_number() OVER (PARTITION BY day
             |    ORDER BY lift_millis DESC, event_type) AS rank FROM l)
             |WHERE rank <= 3""".stripMargin)),

    // top session paths: 3-event type sequences WITHIN 6-hour-gap
    // sessions (gaps-and-islands session ids, then lead() triples that
    // must stay inside one session), counted corpus-wide, top-10 by
    // (count desc, path). Distinct paths are bounded by |event_types|³ —
    // the final ordering runs on a model-sized table (TakeOrdered).
    Q("session_paths",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val gapNs = 6L * 3600 * 1000000000L
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("__brk",
            when(lag("ts", 1).over(w).isNull ||
              col("ts") - lag("ts", 1).over(w) > gapNs, 1).otherwise(0))
          .withColumn("__sid", sum("__brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val triples = sess
          .withColumn("__t2", lead("event_type", 1).over(w))
          .withColumn("__s2", lead("__sid", 1).over(w))
          .withColumn("__t3", lead("event_type", 2).over(w))
          .withColumn("__s3", lead("__sid", 2).over(w))
          .filter(col("__s2") === col("__sid") && col("__s3") === col("__sid"))
          .select(concat_ws(">", col("event_type"), col("__t2"), col("__t3"))
            .as("path"))
        triples.groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path")).limit(10)
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type
             |  FROM events),
             |m AS (
             |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
             |    OR ts - lag(ts) OVER w > 21600000000000 THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |g AS (
             |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m),
             |t AS (
             |  SELECT event_type AS t1,
             |    lead(event_type, 1) OVER w AS t2, lead(sid, 1) OVER w AS s2,
             |    lead(event_type, 2) OVER w AS t3, lead(sid, 2) OVER w AS s3,
             |    sid
             |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT concat_ws('>', t1, t2, t3) AS path,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM t WHERE s2 = sid AND s3 = sid
             |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin)),

    // SCD2 dimension history from a changelog: consecutive same-state
    // events collapse (CDC compression), each surviving change opens a
    // versioned validity interval [valid_from, valid_to) closed by the
    // next change — the lakehouse slowly-changing-dimension shape. Two
    // window passes, both partitioned by the high-cardinality user id.
    Q("scd2_history",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val changes = events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("__prev", lag("event_type", 1).over(w))
          .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
        changes
          .withColumn("valid_to", lead("ts", 1).over(w))
          .withColumn("version", row_number().over(w).cast("int"))
          .select(col("user_id"), col("event_type").as("state"),
            col("ts").as("valid_from"), col("valid_to"), col("version"),
            col("valid_to").isNull.cast("int").as("is_current"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type
             |  FROM events),
             |c AS (
             |  SELECT *, lag(event_type) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id) AS prev
             |  FROM e),
             |ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id, event_type AS state, ts AS valid_from,
             |  lead(ts) OVER w AS valid_to,
             |  CAST(row_number() OVER w AS INTEGER) AS version,
             |  CAST(lead(ts) OVER w IS NULL AS INTEGER) AS is_current
             |FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""
        .stripMargin)),

    // universe sampling: a 1-in-8 hash slice of USERS (not rows) — every
    // sampled user keeps ALL their events, so joins/sessions/funnels on
    // the sample are complete per retained entity (Quickr/BlinkDB's
    // "universe" sample, the only sample type that survives a join on the
    // sampled key). Portable md5 hash = same slice on any engine.
    Q("universe_sample",
      (s, dir) => {
        val slice =
          graft.ops.Sketches.hash60(col("user_id")) % 8 === 0
        events(s, dir).filter(slice)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(round(col("value") * 100).cast("long")).as("spend_cents"),
            countDistinct("event_type").as("n_types"))
      },
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |    AS spend_cents,
             |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
             |FROM events
             |WHERE CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
             |    AS BIGINT) % 8 = 0
             |GROUP BY 1""".stripMargin)),

    // linear multi-touch attribution — the join-based companion to
    // last-touch: every view in the hour before a purchase shares the
    // purchase value equally (credit = value/n). The per-purchase window
    // spans only that purchase's in-window candidates (bounded by hourly
    // user activity); per-view credits are round-9 DECIMAL-summed.
    Q("attribution_linear",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir)
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("vu"), col("event_id").as("view_id"),
            expr("ts div 1000").as("v_us"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
            expr("ts div 1000").as("p_us"),
            round(col("value") * 100).cast("long").as("cents"))
        val j = p.join(v, col("pu") === col("vu") &&
          col("v_us") < col("p_us") &&
          col("v_us") >= col("p_us") - 3600000000L)
        val w = Window.partitionBy("purchase_id")
        j.withColumn("__n", count(lit(1)).over(w))
          .withColumn("__credit",
            round(col("cents").cast("double") / 100.0 / col("__n"), 9)
              .cast("decimal(20,9)"))
          .groupBy("view_id")
          .agg(count(lit(1)).as("n_conversions"),
            sum("__credit").cast("double").as("credit_total"))
      },
      Some("""WITH v AS (SELECT user_id AS u, event_id AS view_id,
             |    epoch_us(ts) AS vus FROM events WHERE event_type = 'view'),
             |p AS (SELECT user_id AS u, event_id AS purchase_id,
             |    epoch_us(ts) AS pus, CAST(round(value*100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |j AS (SELECT view_id, purchase_id, cents,
             |    count(*) OVER (PARTITION BY purchase_id) AS n
             |  FROM p JOIN v ON p.u = v.u AND v.vus < p.pus
             |    AND v.vus >= p.pus - 3600000000)
             |SELECT view_id, CAST(count(*) AS BIGINT) AS n_conversions,
             |  CAST(sum(CAST(round(CAST(cents AS DOUBLE)/100.0/n, 9)
             |    AS DECIMAL(20,9))) AS DOUBLE) AS credit_total
             |FROM j GROUP BY 1""".stripMargin)),

    // exact audience overlap via bitmap indexes (flat-word roaring shape):
    // one row per 63 user ids carries the membership word (63-bit words
    // keep the sign bit clear of DuckDB's shift range check); pairwise
    // intersection = equi-join on word index + popcount of ANDed words.
    // sum(DISTINCT 2^bit) IS the bitwise OR (distinct powers add
    // carry-free). Exact counts — the audience-join primitive.
    Q("bitmap_overlap",
      (s, dir) => graft.ops.Sketches.bitmapOverlap(events(s, dir),
        "event_type", "user_id"),
      Some("""WITH w AS (
             |  SELECT event_type AS g, user_id // 63 AS w,
             |    CAST(sum(DISTINCT (CAST(1 AS BIGINT)
             |      << CAST(user_id % 63 AS INTEGER))) AS BIGINT) AS bm
             |  FROM events GROUP BY 1, 2),
             |sz AS (SELECT g, CAST(sum(bit_count(bm)) AS BIGINT) AS n
             |  FROM w GROUP BY 1),
             |j AS (SELECT a.g AS ga, b.g AS gb,
             |    CAST(sum(bit_count(a.bm & b.bm)) AS BIGINT) AS c
             |  FROM w a JOIN w b ON a.w = b.w AND a.g < b.g GROUP BY 1, 2)
             |SELECT ga AS group_a, gb AS group_b, sa.n AS n_a, sb.n AS n_b,
             |  c AS n_common,
             |  round(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 9)
             |    AS jaccard
             |FROM j JOIN sz sa ON sa.g = ga JOIN sz sb ON sb.g = gb
             |WHERE c > 0""".stripMargin)),

    // Markov-chain attribution with removal effects (Anderl et al.) — the
    // model-based third leg next to last-touch and linear: journeys as a
    // first-order chain with absorbing CONV/NULL; a channel's credit is
    // the relative drop in START→CONV absorption when journeys entering
    // it die. Absorption via 12 FIXED-POINT INTEGER iterations in
    // millionths (PageRank discipline) over the model-sized transition
    // matrix; the oracle unrolls every iteration of every scenario.
    Q("attribution_markov",
      // fixed business channel list, matching the oracle's unrolled
      // removal scenarios — unknown event types still shape the chain
      (s, dir) => graft.ops.Attribution.markovRemoval(events(s, dir),
        "user_id", "event_type", "ts", "event_id", "purchase",
        channelFilter = Some(Seq("view", "click", "signup", "error"))),
      Some {
        def iterCtes(tag: String, removed: Option[String]): String = {
          val v0 = s"v${tag}0 AS (SELECT from_s AS s, CAST(0 AS BIGINT) AS v FROM tot)"
          val its = (1 to 12).map { t =>
            val expr = s"(coalesce(cv.cnt, 0) * 1000000 + coalesce(ct.sc, 0)) // tot.tot"
            val vExpr = removed match {
              case Some(c) =>
                s"CASE WHEN tot.from_s = '$c' THEN CAST(0 AS BIGINT) ELSE $expr END"
              case None => expr
            }
            s"""c$tag$t AS (
               |  SELECT tr.from_s, CAST(sum(tr.cnt * vp.v) AS BIGINT) AS sc
               |  FROM trans tr JOIN v$tag${t - 1} vp ON vp.s = tr.to_s
               |  GROUP BY 1),
               |v$tag$t AS (
               |  SELECT tot.from_s AS s, CAST($vExpr AS BIGINT) AS v
               |  FROM tot
               |  LEFT JOIN trans cv ON cv.from_s = tot.from_s AND cv.to_s = 'CONV'
               |  LEFT JOIN c$tag$t ct ON ct.from_s = tot.from_s)""".stripMargin
          }
          (v0 +: its).mkString(",\n")
        }
        val chans = Seq("view", "click", "signup", "error")
        val scen = (("base", None: Option[String]) +:
          chans.map(c => (c, Some(c): Option[String])))
          .map { case (tag, rm) => iterCtes(tag, rm) }.mkString(",\n")
        val resRows = chans.map { c =>
          s"""SELECT '$c' AS channel,
             |  (SELECT tot FROM tot WHERE from_s = '$c') AS n_visits,
             |  (SELECT v FROM vbase12 WHERE s = 'START') AS b,
             |  (SELECT v FROM v${c}12 WHERE s = 'START') AS r""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH b0 AS (
           |  SELECT user_id AS u, event_type AS t, epoch_ns(ts) AS ts,
           |    event_id AS id
           |  FROM events),
           |p AS (SELECT u, t,
           |    row_number() OVER (PARTITION BY u ORDER BY ts, id) AS pos
           |  FROM b0),
           |cp AS (SELECT u, min(CASE WHEN t = 'purchase' THEN pos END) AS cpos
           |  FROM p GROUP BY 1),
           |tch AS (SELECT p.u, p.t, p.pos, cp.cpos
           |  FROM p JOIN cp USING (u)
           |  WHERE coalesce(cp.cpos, 2147483647) > p.pos AND p.t <> 'purchase'),
           |nx AS (SELECT u, t, pos, cpos,
           |    lead(t) OVER (PARTITION BY u ORDER BY pos) AS nxt FROM tch),
           |tr1 AS (SELECT t AS from_s,
           |    coalesce(nxt, CASE WHEN cpos IS NOT NULL THEN 'CONV'
           |      ELSE 'NULL' END) AS to_s FROM nx),
           |st AS (SELECT 'START' AS from_s,
           |    CASE WHEN t = 'purchase' THEN 'CONV' ELSE t END AS to_s
           |  FROM p WHERE pos = 1),
           |trans AS (SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS cnt
           |  FROM (SELECT * FROM tr1 UNION ALL SELECT * FROM st)
           |  GROUP BY 1, 2),
           |tot AS (SELECT from_s, CAST(sum(cnt) AS BIGINT) AS tot
           |  FROM trans GROUP BY 1),
           |$scen,
           |res AS (
           |$resRows),
           |te AS (SELECT CAST(sum(b - r) AS DOUBLE) AS es FROM res)
           |SELECT channel, n_visits,
           |  round(b / 1e6, 9) AS base_conv,
           |  round(r / 1e6, 9) AS removed_conv,
           |  round(CAST(b - r AS DOUBLE) / b, 9) AS removal_effect,
           |  round(CAST(b - r AS DOUBLE) / es, 9) AS attribution
           |FROM res, te ORDER BY channel""".stripMargin
      }),

    // last-touch attribution: each purchase credits the most recent
    // preceding non-purchase event by the same user within a 7-day
    // lookback — implemented as a per-user running "latest touch" carried
    // by a window max over the packed (ts, event_id) key, so there is no
    // event×event join at all; credit tallied per touch type.
    Q("attribution_last_touch",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val lookbackNs = 7L * 86400 * 1000000000L
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val ev = events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value"))
        // pack (µs, typecode) so ONE running max carries the whole
        // latest-touch record: µs·32 + code (ns·anything overflows BIGINT;
        // same-µs ties — never in practice — break by code, identically
        // on both engines)
        val packed = when(col("event_type") =!= "purchase",
          expr("(ts div 1000) * 32 + " +
            "(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 " +
            "WHEN 'add_to_cart' THEN 3 WHEN 'search' THEN 4 ELSE 5 END)"))
        val credited = ev.withColumn("__touch", max(packed).over(w))
          .filter(col("event_type") === "purchase" && col("__touch").isNotNull)
          .withColumn("__touch_us", expr("__touch div 32"))
          .filter(expr(s"ts div 1000") - col("__touch_us") <= lookbackNs / 1000)
          .withColumn("touch_type",
            expr("CASE __touch % 32 WHEN 1 THEN 'view' " +
              "WHEN 2 THEN 'click' WHEN 3 THEN 'add_to_cart' " +
              "WHEN 4 THEN 'search' ELSE 'other' END"))
        credited.groupBy("touch_type")
          .agg(count(lit(1)).as("n_conversions"),
            sum(round(col("value") * 100).cast("long")).as("revenue_cents"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type, value
             |  FROM events),
             |p AS (
             |  SELECT *, max(CASE WHEN event_type <> 'purchase' THEN
             |      (ts // 1000) * 32 + (CASE event_type WHEN 'view' THEN 1
             |        WHEN 'click' THEN 2 WHEN 'add_to_cart' THEN 3
             |        WHEN 'search' THEN 4 ELSE 5 END) END)
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
             |  FROM e),
             |c AS (
             |  SELECT *, touch // 32 AS touch_us,
             |    CASE touch % 32 WHEN 1 THEN 'view'
             |      WHEN 2 THEN 'click' WHEN 3 THEN 'add_to_cart'
             |      WHEN 4 THEN 'search' ELSE 'other' END AS touch_type
             |  FROM p
             |  WHERE event_type = 'purchase' AND touch IS NOT NULL)
             |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_conversions,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |    AS revenue_cents
             |FROM c WHERE ts // 1000 - touch_us <= 604800000000
             |GROUP BY 1""".stripMargin)),

    // per-type winsorization: clamp values into the exact [p01, p99]
    // band computed from the distinct-value histogram pattern (cents
    // integers; bounded window over distinct values, never data rows).
    Q("winsorize_values",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir).select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        val hist = ev.groupBy("event_type", "cents").agg(count(lit(1)).as("c"))
        val byVal = Window.partitionBy("event_type").orderBy("cents")
        val all = Window.partitionBy("event_type")
        val th = hist.withColumn("cum", sum("c").over(byVal))
          .withColumn("n", sum("c").over(all))
          .groupBy("event_type")
          .agg(min(when(col("cum") >= expr("(n + 99) div 100"), col("cents")))
            .as("p01_cents"),
            min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("cents")))
              .as("p99_cents"))
        ev.join(th, "event_type")
          .select(col("event_id"), col("event_type"),
            (col("cents").cast("double") / 100.0).as("value"),
            (greatest(least(col("cents"), col("p99_cents")), col("p01_cents"))
              .cast("double") / 100.0).as("winsorized"),
            (col("cents") < col("p01_cents") || col("cents") > col("p99_cents"))
              .cast("int").as("clipped"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |h AS (SELECT event_type, cents, count(*) AS c FROM ev GROUP BY 1, 2),
             |cw AS (
             |  SELECT event_type, cents,
             |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY cents)
             |      AS BIGINT) AS cum,
             |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
             |  FROM h),
             |th AS (
             |  SELECT event_type,
             |    min(CASE WHEN cum >= (n + 99) // 100 THEN cents END) AS p01,
             |    min(CASE WHEN cum >= (99 * n + 99) // 100 THEN cents END) AS p99
             |  FROM cw GROUP BY 1)
             |SELECT event_id, ev.event_type,
             |  CAST(cents AS DOUBLE) / 100.0 AS value,
             |  CAST(greatest(least(cents, p99), p01) AS DOUBLE) / 100.0
             |    AS winsorized,
             |  CAST(cents < p01 OR cents > p99 AS INTEGER) AS clipped
             |FROM ev JOIN th ON th.event_type = ev.event_type""".stripMargin)),

    // EWMA anomaly detection on daily per-type counts: the exponentially
    // weighted baseline over the 8 prior observed days with α = 1/4,
    // evaluated EXACTLY — decay weights 3^d·4^(7−d) are integer literals,
    // the baseline is a ratio of integer dot products (missing lags drop
    // out of numerator AND denominator), and the spike/drop verdicts
    // compare integer millis. The classic ops-metrics smoothing primitive
    // with a bit-identical cross-engine replay.
    Q("ewma_anomaly",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wts = (0 until 8).map(d =>
          math.pow(3, d).toLong * math.pow(4, 7 - d).toLong)
        val daily = events(s, dir)
          .groupBy(expr("ts div 86400000000000").as("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val lagged = (1 to 8).foldLeft(daily) { (d, i) =>
          d.withColumn(s"__l$i", lag("cnt", i).over(w))
        }
        val num = (1 to 8).map(i =>
          when(col(s"__l$i").isNotNull, col(s"__l$i") * wts(i - 1))
            .otherwise(lit(0L))).reduce(_ + _)
        val den = (1 to 8).map(i =>
          when(col(s"__l$i").isNotNull, lit(wts(i - 1)))
            .otherwise(lit(0L))).reduce(_ + _)
        lagged.withColumn("__num", num).withColumn("__den", den)
          .filter(col("__den") > 0)
          .select(col("day"), col("event_type"), col("cnt"),
            expr("(1000 * __num) div __den").as("ewma_millis"),
            expr("(cnt * 1000 * __den) div __num").as("ratio_millis"))
          .withColumn("spike", (col("ratio_millis") > 1500).cast("int"))
          .withColumn("drop", (col("ratio_millis") < 667).cast("int"))
      },
      Some {
        val wts = (0 until 8).map(d =>
          math.pow(3, d).toLong * math.pow(4, 7 - d).toLong)
        val lags = (1 to 8).map(i =>
          s"lag(cnt, $i) OVER (PARTITION BY event_type ORDER BY day) AS l$i")
          .mkString(",\n             ")
        val num = (1 to 8).map(i =>
          s"CASE WHEN l$i IS NOT NULL THEN l$i * ${wts(i - 1)} ELSE 0 END")
          .mkString(" + ")
        val den = (1 to 8).map(i =>
          s"CASE WHEN l$i IS NOT NULL THEN ${wts(i - 1)} ELSE 0 END")
          .mkString(" + ")
        s"""WITH d AS (
           |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_type,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM events GROUP BY 1, 2),
           |lg AS (
           |  SELECT day, event_type, cnt,
           |    $lags
           |  FROM d),
           |s AS (
           |  SELECT day, event_type, cnt,
           |    CAST($num AS BIGINT) AS num,
           |    CAST($den AS BIGINT) AS den
           |  FROM lg)
           |SELECT day, event_type, cnt,
           |  (1000 * num) // den AS ewma_millis,
           |  (cnt * 1000 * den) // num AS ratio_millis,
           |  CAST((cnt * 1000 * den) // num > 1500 AS INTEGER) AS spike,
           |  CAST((cnt * 1000 * den) // num < 667 AS INTEGER) AS "drop"
           |FROM s WHERE den > 0""".stripMargin
      }),

    // ---- clip_ds family (stglib/core/utils.py:73-180) -----------------
    Q("clip_deployment",
      (s, dir) => Clip.clipDeployment(events(s, dir), "ts",
          nsL = ns("2024-01-05"), nsR = ns("2024-01-20"))
        .selectExpr("event_id", "ts div 1000 as ts", "value"),
      Some("""SELECT event_id, epoch_us(ts) AS ts, value FROM events
             |WHERE ts >= TIMESTAMP '2024-01-05' AND ts <= TIMESTAMP '2024-01-20'""".stripMargin)),

    Q("clip_good_dates",
      (s, dir) => Clip.clipGoodDatesNs(events(s, dir), "ts", Seq(
          (ns("2024-01-03"), ns("2024-01-08")),
          (ns("2024-01-15"), ns("2024-01-22"))))
        .selectExpr("event_id", "ts div 1000 as ts", "value"),
      Some("""SELECT event_id, epoch_us(ts) AS ts, value FROM events
             |WHERE (ts > TIMESTAMP '2024-01-03' AND ts <= TIMESTAMP '2024-01-08')
             |   OR (ts > TIMESTAMP '2024-01-15' AND ts <= TIMESTAMP '2024-01-22')""".stripMargin)),

    Q("clip_good_ens",
      (s, dir) => Clip.clipGoodEns(events(s, dir),
          Seq((100, 2000), (5000, 8000)), order = Seq("event_id"))
        .selectExpr("event_id", "ts div 1000 as ts", "value"),
      Some("""SELECT event_id, epoch_us(ts) AS ts, value FROM (
             |  SELECT *, row_number() OVER (ORDER BY event_id) - 1 AS pos FROM events)
             |WHERE (pos >= 100 AND pos < 2000) OR (pos >= 5000 AND pos < 8000)""".stripMargin)),

    // ---- value-masking trims (stglib/core/qaqc.py) --------------------
    Q("trim_minmax",
      (s, dir) => Trims.trimMax(Trims.trimMin(
          events(s, dir), "value", 2.0), "value", 95.0)
        .select("event_id", "value"),
      Some("""SELECT event_id,
             |  CASE WHEN value >= 2.0 AND value <= 95.0 THEN value END AS value
             |FROM events""".stripMargin)),

    Q("trim_max_diff",
      (s, dir) => Trims.trimMaxDiff(events(s, dir), "value", 40.0,
          order = Seq("ts", "event_id"), part = Seq("user_id"))
        .select("event_id", "value"),
      Some("""SELECT event_id, CASE WHEN d > 40.0 THEN NULL ELSE value END AS value FROM (
             |  SELECT event_id, value, coalesce(value - lag(value) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS d
             |  FROM events)""".stripMargin)),

    Q("trim_min_diff",
      (s, dir) => Trims.trimMinDiff(events(s, dir), "value", -40.0,
          order = Seq("ts", "event_id"), part = Seq("user_id"))
        .select("event_id", "value"),
      Some("""SELECT event_id, CASE WHEN d < -40.0 THEN NULL ELSE value END AS value FROM (
             |  SELECT event_id, value, coalesce(value - lag(value) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS d
             |  FROM events)""".stripMargin)),

    Q("trim_max_blip",
      (s, dir) => Trims.trimMaxBlip(events(s, dir), "value", 30.0,
          order = Seq("ts", "event_id"), part = Seq("user_id"))
        .select("event_id", "value"),
      Some("""SELECT event_id,
             |  CASE WHEN dprev > 30.0 AND dnext < -30.0 THEN NULL ELSE value END AS value
             |FROM (
             |  SELECT event_id, value,
             |    coalesce(value - lag(value)  OVER w, 0.0) AS dprev,
             |    coalesce(lead(value) OVER w - value, 0.0) AS dnext
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))""".stripMargin)),

    Q("trim_maxabs_diff",
      (s, dir) => Trims.trimMaxAbsDiff(events(s, dir), "value", 45.0,
          order = Seq("ts", "event_id"), part = Seq("user_id"))
        .select("event_id", "value"),
      Some("""SELECT event_id, CASE WHEN abs(d) > 45.0 THEN NULL ELSE value END AS value FROM (
             |  SELECT event_id, value, coalesce(value - lag(value) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS d
             |  FROM events)""".stripMargin)),

    Q("trim_warmup",
      (s, dir) => {
        val df = events(s, dir)
          .withColumn("sample", row_number().over(wUser) - 1)
        Trims.trimWarmup(df, "value", 3, "sample").select("event_id", "value")
      },
      Some("""SELECT event_id, CASE WHEN sample > 3 THEN value END AS value FROM (
             |  SELECT event_id, value, row_number() OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS sample
             |  FROM events)""".stripMargin)),

    Q("trim_bad_ens_dates",
      (s, dir) => Trims.trimBadEnsDatesNs(events(s, dir), "value", "ts", Seq(
          (ns("2024-01-10"), ns("2024-01-12")),
          (ns("2024-01-25"), ns("2024-01-26"))))
        .select("event_id", "value"),
      Some("""SELECT event_id, CASE WHEN
             |  (ts >= TIMESTAMP '2024-01-10' AND ts <= TIMESTAMP '2024-01-12') OR
             |  (ts >= TIMESTAMP '2024-01-25' AND ts <= TIMESTAMP '2024-01-26')
             |  THEN NULL ELSE value END AS value FROM events""".stripMargin)),

    Q("trim_bad_ens_index",
      (s, dir) => Trims.trimBadEnsIndex(events(s, dir), "value",
          Seq((500, 600), (905, 910)), order = Seq("event_id"))
        .select("event_id", "value"),
      Some("""SELECT event_id, CASE WHEN (pos >= 500 AND pos < 600) OR (pos >= 905 AND pos < 910)
             |  THEN NULL ELSE value END AS value FROM (
             |  SELECT event_id, value, row_number() OVER (ORDER BY event_id) - 1 AS pos
             |  FROM events)""".stripMargin)),

    Q("trim_fliers",
      (s, dir) => {
        val masked = Trims.trimMax(events(s, dir), "value", 90.0)
        Trims.trimFliers(masked, "value", 2,
            order = Seq("ts", "event_id"), part = Seq("user_id"))
          .select("event_id", "value")
      },
      Some("""WITH base AS (
             |  SELECT event_id, user_id, ts, CASE WHEN value <= 90.0 THEN value END AS value
             |  FROM events),
             |isl AS (
             |  SELECT *, sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS island
             |  FROM base),
             |runs AS (
             |  SELECT *, count(value) OVER (PARTITION BY user_id, island) AS runlen FROM isl)
             |SELECT event_id, CASE WHEN runlen > 2 THEN value END AS value FROM runs""".stripMargin)),

    Q("trim_mask_expr",
      (s, dir) => MaskExpr.trimMaskExpr(events(s, dir), "value",
          "(value < 1.0)|(value > 95.0)")
        .select("event_id", "value"),
      Some("""SELECT event_id,
             |  CASE WHEN value < 1.0 OR value > 95.0 THEN NULL ELSE value END AS value
             |FROM events""".stripMargin)),

    Q("trim_med_diff",
      (s, dir) => Trims.trimMedDiff(events(s, dir), "value", 30.0, 5,
          order = Seq("ts", "event_id"), part = Seq("user_id"), zeroPad = false)
        .select("event_id", "value"),
      Some("""SELECT event_id, CASE WHEN abs(value - med) > 30.0 THEN NULL ELSE value END AS value
             |FROM (
             |  SELECT event_id, value, median(value) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id
             |     ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS med
             |  FROM events)""".stripMargin)),

    Q("trim_single_bins",
      (s, dir) => {
        // profile shape: bins = events per (user_id, day); null values in
        // day-slices with exactly one valid bin (stglib/aqd/aqdutils.py:661-672)
        val df = events(s, dir)
          .withColumn("day", expr("ts div 86400000000000"))
          .withColumn("value", when(col("value") <= 90.0, col("value")))
        Trims.trimSingleBins(df, "value", Seq("user_id", "day"))
          .select("event_id", "value")
      },
      Some("""SELECT event_id, CASE WHEN nvalid = 1 THEN NULL ELSE value END AS value FROM (
             |  SELECT event_id, value, count(value) OVER (PARTITION BY user_id, day) AS nvalid
             |  FROM (SELECT event_id, user_id, epoch_ns(ts) // 86400000000000 AS day,
             |          CASE WHEN value <= 90.0 THEN value END AS value FROM events))""".stripMargin)),

    Q("dedup_time",
      (s, dir) => {
        // drop_duplicates(dim="time") analog (stglib/sig/cdf2nc.py:1582):
        // deterministic keep-first by event_id per (user_id, minute) key
        val df = events(s, dir)
          .withColumn("minute", expr("ts div 60000000000"))
        df.withColumn("rn", row_number().over(
            Window.partitionBy("user_id", "minute").orderBy("event_id")))
          .filter(col("rn") === 1)
          .select("event_id", "user_id", "minute", "value")
      },
      Some("""SELECT event_id, user_id, minute, value FROM (
             |  SELECT event_id, user_id, epoch_ns(ts) // 60000000000 AS minute, value,
             |    row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 60000000000
             |                       ORDER BY event_id) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin))
  )
}
