package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distribution-drift detection between two slices of the same stream —
 * the train/serve (reference window vs current window) monitoring
 * primitive every production data pipeline ships. Reference semantics:
 * stglib's QA/QC layer flags per-variable anomalies against configured
 * bounds (stglib/core/qaqc.py); these operators generalize that to
 * whole-DISTRIBUTION comparison, the shape used for ML data monitoring.
 *
 * Both statistics run over a FIXED-size equi-width bin grid (extent from
 * one 1-row aggregate, broadcast) so every window is over ≤ `bins` rows
 * per group — never over data-sized row sets; the per-(group, bin) counts
 * are map-side-combinable conditional sums. Cross-engine exactness:
 * 2-decimal values are binned in integer cents arithmetic; KS is integer
 * until one final division; PSI's log terms follow the repo's
 * round-9-then-DECIMAL(20,9) summation discipline (order-free exact
 * addition of quantized terms).
 */
object Drift {

  /** Fixed-point cents + integer equi-width binning over a broadcast
    * 1-row global extent: (group, bin, cnt_a, cnt_b) rows. */
  private def binnedCounts(df: DataFrame, groupCol: String, valueCol: String,
                           sideA: Column, sideB: Column, bins: Int): DataFrame = {
    val c = df.select(col(groupCol).as("__g"),
      round(col(valueCol) * 100).cast("bigint").as("__c"),
      sideA.cast("long").as("__a"), sideB.cast("long").as("__b"))
    val x = c.agg(min("__c").as("__mn"),
      (max("__c") - min("__c") + 1).as("__span"))
    c.crossJoin(broadcast(x))
      .withColumn("__bin", expr(s"((__c - __mn) * $bins) div __span"))
      .groupBy("__g", "__bin")
      .agg(sum("__a").as("__ca"), sum("__b").as("__cb"))
  }

  /**
   * Binned two-sample Kolmogorov–Smirnov statistic per group:
   * D = max_bin |F_a(bin) − F_b(bin)| over the shared equi-width grid.
   * Computed as the integer maximum of |cum_a·n_b − cum_b·n_a| (exact —
   * both engines agree bit-for-bit), divided once at the end. The binned
   * ECDF is what scales: an exact KS needs a total order over distinct
   * values (data-sized window); ≤ `bins` grid rows per group is O(1).
   *
   * Output: (groupCol, n_a, n_b, ks_num, ks).
   */
  def binnedKs(df: DataFrame, groupCol: String, valueCol: String,
               sideA: Column, sideB: Column, bins: Int = 64): DataFrame = {
    val h = binnedCounts(df, groupCol, valueCol, sideA, sideB, bins)
    val byBin = Window.partitionBy("__g").orderBy("__bin")
    val all = Window.partitionBy("__g")
    h.withColumn("__cuma", sum("__ca").over(byBin))
      .withColumn("__cumb", sum("__cb").over(byBin))
      .withColumn("__na", sum("__ca").over(all))
      .withColumn("__nb", sum("__cb").over(all))
      .groupBy(col("__g").as(groupCol))
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        max(abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
          .as("ks_num"))
      // try_divide: a group entirely on one side of the split has
      // n_a*n_b = 0 — ks is undefined (NULL), matching the oracle's x/0
      .withColumn("ks", round(try_divide(col("ks_num").cast("double"),
        (col("n_a") * col("n_b")).cast("double")), 9))
  }

  /**
   * Population Stability Index per group over the same fixed grid:
   * PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) with add-one (Laplace) smoothed
   * bin probabilities p_i = (cnt_a_i + 1)/(n_a + B) — the standard guard
   * that keeps empty bins finite AND makes the full B-bin grid matter
   * (absent bins still contribute, so the grid is generated explicitly:
   * distinct groups × sequence(0, B−1), a bounded cross). Industry rule
   * of thumb: PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 drifted.
   *
   * Output: (groupCol, n_a, n_b, psi).
   */
  def psi(df: DataFrame, groupCol: String, valueCol: String,
          sideA: Column, sideB: Column, bins: Int = 64): DataFrame =
    psiTail(binnedCounts(df, groupCol, valueCol, sideA, sideB, bins),
      groupCol, bins)

  /** Shared PSI tail over (__g, __bin, __ca, __cb) bin counts: explicit
    * full grid (absent bins matter under smoothing), add-one smoothed
    * probabilities, round-9 DECIMAL term sum. */
  private def psiTail(h: DataFrame, groupCol: String, bins: Int): DataFrame = {
    val totals = h.groupBy("__g")
      .agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
    val grid = totals.select(col("__g"), col("__na"), col("__nb"),
      explode(sequence(lit(0), lit(bins - 1))).as("__bin"))
    val full = grid.join(h, Seq("__g", "__bin"), "left")
      .select(col("__g"), col("__na"), col("__nb"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val p = (col("__ca") + 1).cast("double") / (col("__na") + bins).cast("double")
    val q = (col("__cb") + 1).cast("double") / (col("__nb") + bins).cast("double")
    full
      .withColumn("__term",
        round((p - q) * log(p / q), 9).cast("decimal(20,9)"))
      .groupBy(col("__g").as(groupCol))
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        sum("__term").cast("double").as("psi"))
  }

  /**
   * PSI from two FIXED-grid register tables ([[Sketches.histRegisters]]
   * shape: (group, __b, __cnt)) — the deployment form of [[psi]]: the
   * reference side is built once batch-side from training data, the
   * current side accumulates under Structured Streaming (complete mode,
   * ≤ groups×bins state) or merges from shards by adding counts, and the
   * comparison is this cheap register-level fold. A group present on only
   * one side still scores (smoothing keeps empty-side bins finite).
   * Same add-one/full-grid/round-9 semantics as [[psi]], so scores are
   * bit-identical wherever the two binnings agree.
   */
  def psiFromRegisters(ref: DataFrame, cur: DataFrame, groupCol: String,
                       bins: Int = 64): DataFrame = {
    val a = ref.select(col(groupCol).as("__g"), col("__b").as("__bin"),
      col("__cnt").as("__ca"))
    val b = cur.select(col(groupCol).as("__g"), col("__b").as("__bin"),
      col("__cnt").as("__cb"))
    val h = a.join(b, Seq("__g", "__bin"), "full_outer")
      .select(col("__g"), col("__bin"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    psiTail(h, groupCol, bins)
  }

  /** Binned KS from the same two fixed-grid register tables — with
    * [[psiFromRegisters]] this completes the register-level monitoring
    * pair (PSI for magnitude-of-shift, KS for worst-point ECDF gap).
    * Integer numerator until one final division, as in [[binnedKs]]. */
  def ksFromRegisters(ref: DataFrame, cur: DataFrame,
                      groupCol: String): DataFrame = {
    val a = ref.select(col(groupCol).as("__g"), col("__b").as("__bin"),
      col("__cnt").as("__ca"))
    val b = cur.select(col(groupCol).as("__g"), col("__b").as("__bin"),
      col("__cnt").as("__cb"))
    val h = a.join(b, Seq("__g", "__bin"), "full_outer")
      .select(col("__g"), col("__bin"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val byBin = Window.partitionBy("__g").orderBy("__bin")
    val all = Window.partitionBy("__g")
    h.withColumn("__cuma", sum("__ca").over(byBin))
      .withColumn("__cumb", sum("__cb").over(byBin))
      .withColumn("__na", sum("__ca").over(all))
      .withColumn("__nb", sum("__cb").over(all))
      .groupBy(col("__g").as(groupCol))
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        max(abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
          .as("ks_num"))
      // try_divide: a group entirely on one side of the split has
      // n_a*n_b = 0 — ks is undefined (NULL), matching the oracle's x/0
      .withColumn("ks", round(try_divide(col("ks_num").cast("double"),
        (col("n_a") * col("n_b")).cast("double")), 9))
  }

  /** Cumulative Binomial(8, 1/8) thresholds over denominator 8^8 — the
    * exact-integer inverse-CDF table for hash-derived bootstrap weights
    * (mean 1, variance 7/8 — the binomial stand-in for Poisson(1)). */
  private val BootCum: Seq[Long] = {
    val pmf = (0 to 8).map(k =>
      (8 to (8 - k + 1) by -1).map(_.toLong).product / (1L to k).product *
        math.pow(7, 8 - k).toLong)
    pmf.scanLeft(0L)(_ + _).tail
  }

  /**
   * Bootstrap confidence interval for the per-group mean — uncertainty
   * quantification as a DETERMINISTIC distributed operator (Kleiner et
   * al.'s resampling shape, Poisson-bootstrap style): replicate b draws
   * each row with weight w ~ Binomial(8, 1/8) (mean 1), derived from ONE
   * md5 hash per (row, replicate) via exact integer inverse-CDF
   * thresholds (denominator 8^8) — no RNG state, both engines draw the
   * SAME resamples, so the interval itself is oracle-checkable.
   *
   * Replicate means are single double divisions of exact integer cent
   * sums, quantized round-9 into DECIMALs for the order-free moment
   * sums; SE = sample std over the B replicate means. Scale: one
   * projection of B weight columns (the explode is by the SMALL constant
   * B), one groupBy (group, replicate) — map-side combinable, no row
   * ever leaves its partition twice.
   *
   * Output: (groupCol, n_rows, mean, se_boot, ci_lo, ci_hi) with the
   * ±2·SE normal interval.
   */
  def bootstrapMeanCi(df: DataFrame, groupCol: String, idCol: String,
                      valueCol: String, reps: Int = 32): DataFrame = {
    val cases = BootCum.zipWithIndex.init.reverse
      .foldLeft(lit(8): Column) { case (acc, (c, k)) =>
        when(col("__u") < c, k).otherwise(acc)
      }
    // spread BEFORE the replicate explode: a single-file input arrives as
    // one scan partition, and the explode + per-replicate md5 (reps× the
    // row count, the query's entire cost) would otherwise run on one core
    // inside the scan stage (measured r17: 4.0 s of a 4.4 s query in a
    // tasks=1 stage at sf0.1; guide §2.5 input parallelism)
    val rows = Spread.byKey(df, col(idCol))
      .select(col(groupCol).as("__g"),
        col(idCol).cast("string").as("__id"),
        round(col(valueCol) * 100).cast("long").as("__c"),
        explode(sequence(lit(0), lit(reps - 1))).as("__b"))
      .withColumn("__hid", concat(col("__id"), lit("_"), col("__b")))
      .withColumn("__u", pmod(Sketches.hash60(col("__hid")), lit(16777216L)))
      .withColumn("__w", cases.cast("long"))
    val repMeans = rows.groupBy("__g", "__b")
      .agg(sum(col("__w") * col("__c")).as("__s"), sum("__w").as("__n"))
      .filter(col("__n") > 0)
      // keep the replicate mean as a round-9 DOUBLE; quantize both it and
      // its square separately before the decimal sums (a DECIMAL(24,9)²
      // product needs precision 48 — engines cap/overflow differently)
      .withColumn("__m", round(col("__s").cast("double") /
        (lit(100.0) * col("__n").cast("double")), 9))
    val base = df.groupBy(col(groupCol).as("__g2"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(round(col(valueCol) * 100).cast("long")).cast("double") /
          (lit(100.0) * count(lit(1)).cast("double")), 9).as("mean"))
    repMeans.groupBy("__g")
      .agg(count(lit(1)).as("__nb"),
        sum(col("__m").cast("decimal(24,9)")).cast("double").as("__sm"),
        sum(round(col("__m") * col("__m"), 9).cast("decimal(28,9)"))
          .cast("double").as("__sm2"))
      .withColumn("se_boot", round(sqrt(
        (col("__sm2") - col("__sm") * col("__sm") / col("__nb")) /
          (col("__nb") - 1)), 9))
      .join(base, col("__g") === col("__g2"))
      .select(col("__g").as(groupCol), col("n_rows"), col("mean"),
        col("se_boot"),
        round(col("mean") - col("se_boot") * 2.0, 9).as("ci_lo"),
        round(col("mean") + col("se_boot") * 2.0, 9).as("ci_hi"))
  }

  /**
   * Holt double-exponential smoothing (level + trend) over daily counts —
   * the forecasting companion to the EWMA anomaly detector: with
   * α = β = 1/4, l_t = (y_t + 3·(l_{t−1} + b_{t−1}))/4 and
   * b_t = ((l_t − l_{t−1}) + 3·b_{t−1})/4, initialized l_1 = y_1,
   * b_1 = y_2 − y_1. State is carried in MILLIONTHS with integer floor
   * division each step (the PageRank fixed-point discipline), so both
   * engines replay the identical integer sequence; the oracle is a
   * recursive CTE. One-step-ahead errors ride along (the backtest every
   * forecast needs), and `horizon` extra rows extrapolate
   * l_T + h·b_T past the data.
   *
   * Day-bounded fold per group — same scale shape as [[cusumDaily]].
   *
   * Output: (groupCol, day, n_events, level, trend, forecast, abs_err) —
   * forecast is the one-step-ahead prediction for THAT day (null on the
   * first two); horizon rows carry null n_events/abs_err.
   */
  def holtForecast(df: DataFrame, groupCol: String, tsNsCol: String,
                   horizon: Int = 7): DataFrame = {
    val daily = df.groupBy(col(groupCol).as("__g"),
        expr(s"$tsNsCol div 86400000000000").as("__day"))
      .agg(count(lit(1)).as("__cnt"))
    daily.groupBy("__g")
      .agg(sort_array(collect_list(struct(col("__day"), col("__cnt"))))
        .as("__ds"))
      // single-day groups can't seed a trend: emitted as one row with NULL
      // level/trend/forecast and no horizon — matching the oracle's LEFT
      // JOIN shape (a filter here would silently drop the whole group, and
      // the unguarded slice(…, size-2) dies on ANSI for size = 1)
      .withColumn("__out", when(size(col("__ds")) < 2, expr(
        """array(struct(element_at(__ds, 1).__day AS day,
          |  element_at(__ds, 1).__cnt AS cnt,
          |  CAST(NULL AS BIGINT) AS l, CAST(NULL AS BIGINT) AS b,
          |  CAST(NULL AS BIGINT) AS f))""".stripMargin))
        .otherwise(expr(
        s"""aggregate(slice(__ds, 3, greatest(size(__ds) - 2, 0)),
           |  struct(CAST(element_at(__ds, 2).__cnt * 1000000 AS BIGINT) AS l,
           |    CAST((element_at(__ds, 2).__cnt - element_at(__ds, 1).__cnt)
           |      * 1000000 AS BIGINT) AS b,
           |    CAST(array(
           |      struct(element_at(__ds, 1).__day AS day,
           |        element_at(__ds, 1).__cnt AS cnt,
           |        CAST(NULL AS BIGINT) AS l, CAST(NULL AS BIGINT) AS b,
           |        CAST(NULL AS BIGINT) AS f),
           |      struct(element_at(__ds, 2).__day AS day,
           |        element_at(__ds, 2).__cnt AS cnt,
           |        CAST(element_at(__ds, 2).__cnt * 1000000 AS BIGINT) AS l,
           |        CAST((element_at(__ds, 2).__cnt - element_at(__ds, 1).__cnt)
           |          * 1000000 AS BIGINT) AS b,
           |        CAST(NULL AS BIGINT) AS f)) AS
           |      ARRAY<STRUCT<day: BIGINT, cnt: BIGINT, l: BIGINT, b: BIGINT,
           |                   f: BIGINT>>) AS out),
           |  (a, x) -> struct(
           |    (x.__cnt * 1000000 + 3 * (a.l + a.b)) div 4,
           |    (((x.__cnt * 1000000 + 3 * (a.l + a.b)) div 4 - a.l) + 3 * a.b)
           |      div 4,
           |    concat(a.out, array(struct(x.__day AS day, x.__cnt AS cnt,
           |      ((x.__cnt * 1000000 + 3 * (a.l + a.b)) div 4) AS l,
           |      ((((x.__cnt * 1000000 + 3 * (a.l + a.b)) div 4 - a.l)
           |        + 3 * a.b) div 4) AS b,
           |      (a.l + a.b) AS f)))),
           |  a -> concat(a.out, transform(sequence(1, $horizon),
           |    h -> struct((element_at(a.out, size(a.out)).day + h) AS day,
           |      CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS BIGINT) AS l,
           |      CAST(NULL AS BIGINT) AS b, (a.l + h * a.b) AS f))))""".stripMargin)))
      .select(col("__g"), explode(col("__out")).as("__r"))
      .select(col("__g").as(groupCol), col("__r.day").as("day"),
        col("__r.cnt").as("n_events"),
        round(col("__r.l").cast("double") / 1e6, 6).as("level"),
        round(col("__r.b").cast("double") / 1e6, 6).as("trend"),
        round(col("__r.f").cast("double") / 1e6, 6).as("forecast"),
        when(col("__r.f").isNotNull && col("__r.cnt").isNotNull,
          round(abs(col("__r.cnt").cast("double") -
            col("__r.f").cast("double") / 1e6), 6)).as("abs_err"))
  }

  /**
   * Kaplan–Meier survival estimator over user lifetimes (Kaplan & Meier
   * 1958) — the churn/retention curve: lifetime = last-active −
   * first-active day; a user whose last activity predates the
   * observation-window end has churned at that age, one still active on
   * the final day is right-censored. S(t) = Π_{u≤t} (1 − d_u/n_u) over
   * distinct ages.
   *
   * The age axis is day-bounded, so the whole estimator folds over ONE
   * collected sorted array (the CUSUM pattern): at-risk counts by
   * suffix subtraction, the product as a running sum of round-9 ln
   * terms (order-fixed, both engines identical), exp at the edge; an
   * n_risk = d step pins survival to exactly 0 from there on (no ln(0)
   * anywhere).
   *
   * Output: (t_days, n_risk, n_churn, n_censored, survival).
   */
  def kaplanMeier(df: DataFrame, userCol: String, tsNsCol: String): DataFrame = {
    val days = df.groupBy(col(userCol).as("__u"))
      .agg(expr(s"min($tsNsCol div 86400000000000)").as("__fd"),
        expr(s"max($tsNsCol div 86400000000000)").as("__ld"))
    val w = days.agg(max("__ld").as("__w"), count(lit(1)).as("__nu"))
    days.crossJoin(broadcast(w))
      .select((col("__ld") - col("__fd")).as("__lt"),
        (col("__ld") < col("__w")).cast("long").as("__ch"), col("__nu"))
      .groupBy("__lt")
      .agg(sum("__ch").as("__d"), (count(lit(1)) - sum("__ch")).as("__c"),
        max("__nu").as("__nu"))
      .groupBy()
      .agg(max("__nu").as("__nu"),
        sort_array(collect_list(struct(col("__lt"), col("__d"), col("__c"))))
          .as("__ts"))
      .withColumn("__out", expr(
        """aggregate(__ts,
          |  struct(__nu AS risk, CAST(0 AS DECIMAL(20,9)) AS lns,
          |    false AS dead,
          |    CAST(array() AS ARRAY<STRUCT<t: BIGINT, nr: BIGINT, d: BIGINT,
          |      c: BIGINT, lns: DECIMAL(20,9), dead: BOOLEAN>>) AS out),
          |  (a, x) -> struct(
          |    a.risk - x.__d - x.__c,
          |    CAST(a.lns + CASE WHEN x.__d < a.risk THEN
          |      CAST(round(ln(CAST(a.risk - x.__d AS DOUBLE)
          |        / CAST(a.risk AS DOUBLE)), 9) AS DECIMAL(20,9))
          |      ELSE CAST(0 AS DECIMAL(20,9)) END AS DECIMAL(20,9)),
          |    a.dead OR x.__d >= a.risk,
          |    concat(a.out, array(struct(x.__lt AS t, a.risk AS nr,
          |      x.__d AS d, x.__c AS c,
          |      CAST(a.lns + CASE WHEN x.__d < a.risk THEN
          |        CAST(round(ln(CAST(a.risk - x.__d AS DOUBLE)
          |          / CAST(a.risk AS DOUBLE)), 9) AS DECIMAL(20,9))
          |        ELSE CAST(0 AS DECIMAL(20,9)) END AS DECIMAL(20,9)) AS lns,
          |      (a.dead OR x.__d >= a.risk) AS dead)))),
          |  a -> a.out)""".stripMargin))
      .select(explode(col("__out")).as("__r"))
      .select(col("__r.t").as("t_days"), col("__r.nr").as("n_risk"),
        col("__r.d").as("n_churn"), col("__r.c").as("n_censored"),
        when(col("__r.dead"), lit(0.0))
          .otherwise(round(exp(col("__r.lns").cast("double")), 9))
          .as("survival"))
  }

  /**
   * Split-conformal prediction interval (Papadopoulos et al. 2002; Lei
   * et al. 2018) for a simple linear predictor — the
   * distribution-free uncertainty wrapper every deployed regressor
   * should ship: fit on the train split, take the ⌈(n+1)·level⌉-th
   * smallest absolute residual on a CALIBRATION split as the interval
   * half-width q, and report empirical coverage on the held-out test
   * split (the conformal guarantee: coverage ≥ level up to 1/(n_cal+1)).
   *
   * Exactness: x, y are integers, so the OLS slope/intercept numerators
   * are exact integer sums with single double divisions; residuals are
   * round-9 quantized; the calibration quantile is element_at of ONE
   * sorted collected array — legitimate because the calibration split
   * must be a FIXED-SIZE sample anyway (the repo's bounded-eval rule:
   * a proportional split would grow the exact-quantile state with the
   * corpus). Coverage is an integer count ratio.
   *
   * Output: one row — (n_train, n_cal, n_test, slope, intercept, q,
   * coverage).
   */
  def conformalInterval(df: DataFrame, xCol: String, yCol: String,
                        trainPred: Column, calPred: Column,
                        testPred: Column, levelNum: Int = 9,
                        levelDen: Int = 10): DataFrame = {
    val base = Spread.shared(df.select(col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y"),
      trainPred.as("__tr"), calPred.as("__cal"), testPred.as("__te")))
    val fit = base.filter(col("__tr"))
      .agg(count(lit(1)).as("n_train"), sum("__x").as("__sx"),
        sum("__y").as("__sy"), sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"))
      .withColumn("slope", round(
        (col("n_train") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
        (col("n_train") * col("__sxx") - col("__sx") * col("__sx")).cast("double"), 9))
      .withColumn("intercept", round(
        (col("__sy").cast("double") - col("slope") * col("__sx").cast("double")) /
          col("n_train").cast("double"), 9))
      .select("n_train", "slope", "intercept")
    val withRes = base.crossJoin(broadcast(fit))
      .withColumn("__r", round(abs(col("__y").cast("double") -
        (col("intercept") + col("slope") * col("__x").cast("double"))), 9))
    val q = withRes.filter(col("__cal"))
      .agg(sort_array(collect_list(col("__r"))).as("__rs"),
        count(lit(1)).as("n_cal"))
      .withColumn("q", element_at(col("__rs"), least(
        expr(s"CAST(((n_cal + 1) * $levelNum + $levelDen - 1) div $levelDen AS INT)"),
        col("n_cal").cast("int"))))
      .select("n_cal", "q")
    withRes.filter(col("__te")).crossJoin(broadcast(q))
      .agg(max("n_train").as("n_train"), max("n_cal").as("n_cal"),
        count(lit(1)).as("n_test"),
        max("slope").as("slope"), max("intercept").as("intercept"),
        max("q").as("q"),
        sum((col("__r") <= col("q")).cast("long")).as("__cov"))
      .select(col("n_train"), col("n_cal"), col("n_test"),
        col("slope"), col("intercept"), col("q"),
        round(col("__cov").cast("double") / col("n_test").cast("double"), 9)
          .as("coverage"))
  }

  /**
   * Two-sided CUSUM changepoint scores (Page 1954) over per-day event
   * counts: S⁺_t = max(0, S⁺_{t−1} + (x_t − μ)), S⁻_t mirrored — the
   * classic sequential detector for a sustained level shift, where a
   * single-day spike decays but a persistent change accumulates. All
   * arithmetic is INTEGER in deviation-numerator units (counts × n_days):
   * μ = total/n_days stays rational, so x_t − μ is carried as
   * n_days·x_t − total — bit-identical cross-engine, no float drift in
   * the recursion. Alarm when either side exceeds `total` (cumulative
   * excess ≥ one mean day's volume).
   *
   * The day axis is bounded (one row per (group, day)), so the recursion
   * folds per group over a collected ≤days-length array — bounded state,
   * map-side daily counts, one shuffle on the group key. The oracle
   * replays the recursion as a recursive CTE over row-numbered days.
   *
   * Output: (groupCol, day, n_events, cusum_pos, cusum_neg, alarm).
   */
  def cusumDaily(df: DataFrame, groupCol: String, tsNsCol: String): DataFrame = {
    val daily = df.groupBy(col(groupCol).as("__g"),
        expr(s"$tsNsCol div 86400000000000").as("__day"))
      .agg(count(lit(1)).as("__cnt"))
    daily.groupBy("__g")
      .agg(sort_array(collect_list(struct(col("__day"), col("__cnt")))).as("__ds"),
        sum("__cnt").as("__total"), count(lit(1)).as("__nd"))
      .withColumn("__out", expr(
        """aggregate(__ds,
          |  struct(CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
          |    CAST(array() AS ARRAY<STRUCT<day: BIGINT, cnt: BIGINT,
          |                                 sp: BIGINT, sn: BIGINT>>) AS out),
          |  (a, x) -> struct(
          |    greatest(CAST(0 AS BIGINT), a.sp + (__nd * x.__cnt - __total)) AS sp,
          |    greatest(CAST(0 AS BIGINT), a.sn - (__nd * x.__cnt - __total)) AS sn,
          |    concat(a.out, array(struct(x.__day AS day, x.__cnt AS cnt,
          |      greatest(CAST(0 AS BIGINT), a.sp + (__nd * x.__cnt - __total)) AS sp,
          |      greatest(CAST(0 AS BIGINT), a.sn - (__nd * x.__cnt - __total)) AS sn))) AS out),
          |  a -> a.out)""".stripMargin))
      .select(col("__g"), col("__total"), explode(col("__out")).as("__r"))
      .select(col("__g").as(groupCol), col("__r.day").as("day"),
        col("__r.cnt").as("n_events"),
        col("__r.sp").as("cusum_pos"), col("__r.sn").as("cusum_neg"),
        (col("__r.sp") > col("__total") || col("__r.sn") > col("__total"))
          .cast("int").as("alarm"))
  }

  /**
   * Classical additive seasonal decomposition of per-day counts
   * (STL-lite): trend = centered 7-day moving average, seasonal = mean
   * detrended value per weekday slot, residual = the rest. The moving
   * window is POSITIONAL over present days (both engines agree on any
   * gap pattern) and only full 7-row windows produce a trend — edge days
   * report count-only rows.
   *
   * Exactness: everything is carried ×7 in integers (trend7 = Σcnt,
   * detrended7 = 7·cnt − trend7) and the seasonal/residual means keep
   * integer numerators (Σdet7, counts) until a SINGLE double division —
   * no order-dependent float accumulation anywhere. Windows span ≤7 rows
   * and the seasonal aggregation is 7 slots per group — day-bounded
   * state, one shuffle on the group key.
   *
   * Output: (groupCol, day, n_events, trend, seasonal, residual) with
   * nulls on the 3-day edges.
   */
  def seasonalDecompose(df: DataFrame, groupCol: String,
                        tsNsCol: String): DataFrame = {
    val daily = df.groupBy(col(groupCol).as("__g"),
        expr(s"$tsNsCol div 86400000000000").as("__day"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy("__g").orderBy("__day").rowsBetween(-3, 3)
    val t = daily
      .withColumn("__t7", sum("__cnt").over(w))
      .withColumn("__nw", count(lit(1)).over(w))
      .withColumn("__det7",
        when(col("__nw") === 7, lit(7) * col("__cnt") - col("__t7")))
      .withColumn("__wd", pmod(col("__day"), lit(7)))
    val seas = t.filter(col("__det7").isNotNull)
      .groupBy("__g", "__wd")
      .agg(sum("__det7").as("__s7"), count(lit(1)).as("__sn"))
    t.join(seas, Seq("__g", "__wd"), "left")
      .select(col("__g").as(groupCol), col("__day").as("day"),
        col("__cnt").as("n_events"),
        when(col("__nw") === 7,
          round(col("__t7").cast("double") / 7.0, 9)).as("trend"),
        when(col("__det7").isNotNull,
          round(col("__s7").cast("double") /
            (lit(7) * col("__sn")).cast("double"), 9)).as("seasonal"),
        when(col("__det7").isNotNull,
          round((col("__det7") * col("__sn") - col("__s7")).cast("double") /
            (lit(7) * col("__sn")).cast("double"), 9)).as("residual"))
  }
}
