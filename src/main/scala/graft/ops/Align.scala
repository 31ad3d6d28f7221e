package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-alignment operators (SURVEY §2.4): stglib has no general join — it has
 * `reindex_like(method="nearest", tolerance=...)` patterns
 * (stglib/aqd/aqdutils.py:93-118, stglib/core/utils.py:1946-1956) and
 * calendar regularization (stglib/sig/cdf2nc.py:1553-1594). Re-expressed as
 * sub-bucketed equi-joins + a map-side-combinable best-candidate aggregate.
 *
 * Scale design: the right ("aux") side is broadcast — met/boundary series are
 * orders of magnitude smaller than measurement series. Sub-buckets of width
 * tolerance/64 plus per-bucket boundary rows keep the candidate count per
 * left row O(density·width + 1) — independent of how many aux rows fall in
 * the tolerance band (see [[subBucketCandidates]]). Left rows with no
 * candidate within tolerance survive with nulls (reindex semantics, not
 * inner-join semantics).
 */
object Align {

  /** Sub-buckets per tolerance width — candidate count per left row is
    * O(aux density · tolerance / SubBuckets + 1). */
  private val SubBuckets = 64L

  /** For every key in `leftKeys` (distinct BIGINT col `__kk`), the max of
    * `vals.__v` over val-keys STRICTLY below the left key (Long.MinValue
    * when none). Scale-safe: [[Index.withRunningMax]] over the BUCKET axis
    * (bounded by time-span / bucket width, never by data size), the
    * strictly-below semantics from shifting val keys up by one and making
    * left keys sort after val rows on the same key. */
  private def strictPrefixMax(leftKeys: DataFrame, vals: DataFrame): DataFrame = {
    val tagged = vals
      .select((col("__kk") + 1).as("__kk"), col("__v"), lit(0).as("__tag"))
      .unionByName(leftKeys.select(col("__kk"),
        lit(null).cast("long").as("__v"), lit(1).as("__tag")))
    Index.withRunningMax(tagged, Seq("__kk", "__tag"), "__v", "__bound")
      .filter(col("__tag") === 1)
      .select(col("__kk"), col("__bound"))
  }

  /**
   * Sub-bucketed as-of core (round-12 scale rework). The old design used
   * tolerance-wide buckets, so EVERY aux row within the band joined every
   * left row — candidates grow linearly with aux density (measured 7.5×
   * bench time on 10× denser aux at sf1). With buckets of width
   * tolerance/[[SubBuckets]], the best match for a left row is either in
   * the row's OWN sub-bucket or is exactly the boundary row — the latest
   * aux ts strictly before the bucket (and, for `nearest`, the earliest
   * strictly after) — computed once per bucket via the ranged running-max
   * index, no global window. Exactness: every pre-bucket aux row is ≤ the
   * pre-bucket boundary ts, so if the boundary row fails the tolerance
   * every farther row does too; ties at the boundary ts all join and the
   * final aggregate applies the same tie-break as before.
   *
   * Selection is a map-side-combinable max_by/min_by aggregation over the
   * (now O(1)-ish) candidate set — no per-left-row sort window at all.
   *
   * Returns (left bucket relation, candidate relation keyed by `__k`).
   */
  private def subBucketCandidates(left: DataFrame, right: DataFrame,
                                  leftTs: String, rightTs: String,
                                  tolerance: Long, withBefore: Boolean,
                                  withAfter: Boolean)
      : (DataFrame, DataFrame) = {
    val w = math.max(tolerance / SubBuckets, 1L)
    val lb = Spread.byKey(left, col(leftTs))
      .withColumn("__k", expr(s"$leftTs div $w"))
    val rb = right.withColumn("__k", expr(s"$rightTs div $w"))
    val leftKeys = lb.select(col("__k").as("__kk")).distinct()
    val perBucket = rb.groupBy("__k").agg(
      max(col(rightTs)).as("__bmax"), min(col(rightTs)).as("__bmin"))
    val own = rb.select(col("__k") +: right.columns.map(col): _*)
    var cand = own
    if (withBefore) {
      // boundary BEFORE: latest aux ts in buckets strictly below k
      val before = strictPrefixMax(leftKeys,
          perBucket.select(col("__k").as("__kk"), col("__bmax").as("__v")))
        .filter(col("__bound") =!= Long.MinValue)
        .join(rb.drop("__k"), col("__bound") === col(rightTs))
        .select(col("__kk").as("__k") +: right.columns.map(col): _*)
      cand = cand.unionByName(before)
    }
    if (withAfter) {
      // boundary AFTER: earliest aux ts in buckets strictly above k —
      // the same strict-prefix machinery on negated keys/values
      val after = strictPrefixMax(
          leftKeys.select(negate(col("__kk")).as("__kk")),
          perBucket.select(negate(col("__k")).as("__kk"),
            negate(col("__bmin")).as("__v")))
        .filter(col("__bound") =!= Long.MinValue)
        .select(negate(col("__kk")).as("__kk"), negate(col("__bound")).as("__next"))
        .join(rb.drop("__k"), col("__next") === col(rightTs))
        .select(col("__kk").as("__k") +: right.columns.map(col): _*)
      cand = cand.unionByName(after)
    }
    (lb, cand)
  }

  /** As-of nearest: for each left row, the single right row minimizing
    * |leftTs − rightTs| within tolerance; ties to the earlier right row.
    * Time columns must share units (we standardize on long microseconds).
    * Precondition: left rows are distinct (selection groups by the full
    * left row; duplicated left rows would collapse to one). */
  def asofNearest(left: DataFrame, right: DataFrame,
                  leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    val (lb, cand) = subBucketCandidates(left, right, leftTs, rightTs,
      tolerance, withBefore = true, withAfter = true)
    // cand carries the sub-bucketed right SERIES (data-sized in
    // deployment length) — no forced broadcast; the join is equi on
    // __k, so AQE broadcasts a small aux series and shuffles a big one
    val joined = lb.as("l").join(cand.as("r"),
        col("l.__k") === col("r.__k") &&
        col(rightTs) >= col(leftTs) - tolerance &&
        col(rightTs) <= col(leftTs) + tolerance, "left")
      .drop("__k")
    val ord = struct(abs(col(leftTs) - col(rightTs)) +: col(rightTs) +:
      right.columns.filter(_ != rightTs).map(col): _*)
    bestPerLeft(joined, left, right, min_by(_, ord))
  }

  /** As-of backward: most recent right row at-or-before leftTs within
    * tolerance (boundary/brange pattern, stglib/aqd/aqdutils.py:550-560). */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    val (lb, cand) = subBucketCandidates(left, right, leftTs, rightTs,
      tolerance, withBefore = true, withAfter = false)
    // cand carries the sub-bucketed right SERIES (data-sized in
    // deployment length) — no forced broadcast; the join is equi on
    // __k, so AQE broadcasts a small aux series and shuffles a big one
    val joined = lb.as("l").join(cand.as("r"),
        col("l.__k") === col("r.__k") &&
        col(rightTs) <= col(leftTs) &&
        col(rightTs) >= col(leftTs) - tolerance, "left")
      .drop("__k")
    val ord = struct(col(rightTs) +:
      right.columns.filter(_ != rightTs).map(col): _*)
    bestPerLeft(joined, left, right, max_by(_, ord))
  }

  /** Shared selection tail: one aggregate row per left row (left rows are
    * distinct by precondition), payload = the chosen right row's columns
    * (all null when no candidate survived the tolerance). */
  private def bestPerLeft(joined: DataFrame, left: DataFrame, right: DataFrame,
                          pick: org.apache.spark.sql.Column =>
                            org.apache.spark.sql.Column): DataFrame = {
    val payload = struct(right.columns.map(col): _*)
    joined.groupBy(left.columns.map(col): _*)
      .agg(pick(payload).as("__best"))
      .select(left.columns.map(col) ++
        right.columns.map(c => col(s"__best.$c").as(c)): _*)
  }

  /** As-of forward: earliest right row at-or-after leftTs within tolerance
    * (the other bracket of linear interpolation). */
  def asofForward(left: DataFrame, right: DataFrame,
                  leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    val (lb, cand) = subBucketCandidates(left, right, leftTs, rightTs,
      tolerance, withBefore = false, withAfter = true)
    // cand carries the sub-bucketed right SERIES (data-sized in
    // deployment length) — no forced broadcast; the join is equi on
    // __k, so AQE broadcasts a small aux series and shuffles a big one
    val joined = lb.as("l").join(cand.as("r"),
        col("l.__k") === col("r.__k") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + tolerance, "left")
      .drop("__k")
    val ord = struct(col(rightTs) +:
      right.columns.filter(_ != rightTs).map(col): _*)
    bestPerLeft(joined, left, right, min_by(_, ord))
  }

  /** Linear time interpolation of a right-side series onto left timestamps —
    * the reference's `reindex`/`interp` with method="linear" (xarray interp;
    * e.g. stglib met-series alignment): y = y0 + (y1−y0)·(t−t0)/(t1−t0)
    * from the bracketing right rows within tolerance; exact hits return y0;
    * a missing bracket yields null (no extrapolation, like xarray's NaN
    * outside). Built from the bucketized as-of joins — two broadcast-range
    * equi-joins, no global sort. */
  def interpLinear(left: DataFrame, right: DataFrame, leftTs: String,
                   rightTs: String, valCol: String, tolerance: Long,
                   outCol: String): DataFrame = {
    // BOTH brackets from ONE sub-bucket pass (r17): the chained
    // asofBackward∘asofForward form ran the whole candidate machinery
    // (bucket index, boundary rows via two running-max passes, join,
    // per-left aggregate) twice over the same right series. One joined
    // candidate set + two conditional struct aggregates select the
    // identical rows: max(struct(t0, y0)) over rightTs ≤ leftTs is
    // exactly asofBackward's max_by(payload, struct(rightTs, y)) because
    // payload and ordering struct have the same fields in the same
    // order, and min(struct(t1, y1)) over rightTs ≥ leftTs is
    // asofForward's min_by — InterpSamePathSpec proves row equality
    // against the chained form on the registered query and edge series.
    val r = right.select(col(rightTs).as("__rt"), col(valCol).as("__rv"))
    val (lb, cand) = subBucketCandidates(left, r, leftTs, "__rt",
      tolerance, withBefore = true, withAfter = true)
    val joined = lb.as("l").join(cand.as("r"),
        col("l.__k") === col("r.__k") &&
        col("__rt") >= col(leftTs) - tolerance &&
        col("__rt") <= col(leftTs) + tolerance, "left")
      .drop("__k")
    joined.groupBy(left.columns.map(col): _*)
      .agg(
        max(when(col("__rt") <= col(leftTs),
          struct(col("__rt").as("__t0"), col("__rv").as("__y0")))).as("__lo"),
        min(when(col("__rt") >= col(leftTs),
          struct(col("__rt").as("__t1"), col("__rv").as("__y1")))).as("__hi"))
      .select(left.columns.map(col) :+
        col("__lo.__t0").as("__t0") :+ col("__lo.__y0").as("__y0") :+
        col("__hi.__t1").as("__t1") :+ col("__hi.__y1").as("__y1"): _*)
      .withColumn(outCol,
        when(col("__t1") === col("__t0"), col("__y0"))
          .otherwise(col("__y0") + (col("__y1") - col("__y0")) *
            ((col(leftTs) - col("__t0")).cast("double") /
             (col("__t1") - col("__t0")).cast("double"))))
      .drop("__t0", "__y0", "__t1", "__y1")
  }

  /** Perfect calendar grid [startUs, endUs) with the given step — the
    * date_range(t0, Δ=1/sr) reindex target. Generated as a plain
    * `spark.range(n)` with an affine tick map: range partitions stream
    * their ids lazily inside whole-stage codegen (no per-task arrays) and
    * carry CORRECT size statistics. The previous sequence+explode form
    * failed twice at x100 deployment scale (found by the chain-scale
    * harness): the single `sequence()` materialized the whole grid as one
    * ~400 MB in-task array, and after chunking, `explode`'s unchanged
    * child statistics made the planner STATISTICS-BROADCAST the 20 M-row
    * grid side of the reindex join. `range` has neither problem. */
  def calendarGrid(spark: SparkSession, startUs: Long, endUs: Long,
                   stepUs: Long, colName: String): DataFrame = {
    require(stepUs > 0, s"calendarGrid step must be positive, got $stepUs")
    val n = if (endUs <= startUs) 0L else (endUs - 1 - startUs) / stepUs + 1
    spark.range(n).select((lit(startUs) + col("id") * stepUs).as(colName))
  }
}
