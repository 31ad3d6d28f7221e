package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-alignment operators (SURVEY §2.4): stglib has no general join — it has
 * `reindex_like(method="nearest", tolerance=...)` patterns
 * (stglib/aqd/aqdutils.py:93-118, stglib/core/utils.py:1946-1956) and
 * calendar regularization (stglib/sig/cdf2nc.py:1553-1594). Re-expressed as
 * bounded range joins + per-row rank.
 *
 * Scale design: the right ("aux") side is broadcast — met/boundary series are
 * orders of magnitude smaller than measurement series. The band predicate
 * bounds the join fan-out to (tolerance / aux sample interval) candidates per
 * left row, so the rank window stays tiny. Left rows with no candidate within
 * tolerance survive with nulls (reindex semantics, not inner-join semantics).
 */
object Align {

  /** Bucketized as-of core: quantize both sides to tolerance-sized buckets,
    * explode each right row to the adjacent bucket keys that could contain a
    * matching left row, and equi-join on the bucket. This turns the band join
    * into a Broadcast HASH join — a plain band predicate on a broadcast side
    * becomes a nested-loop scan, O(|L|·|R|) comparisons regardless of how few
    * rows actually fall inside the band. A candidate right row matches
    * exactly one bucket key per left row, so no dedup is needed. */
  private def bucketJoin(left: DataFrame, right: DataFrame,
                         leftTs: String, rightTs: String, tolerance: Long,
                         rightKeyOffsets: Seq[Int], bandPred: org.apache.spark.sql.Column)
      : DataFrame = {
    val lb = Spread.byKey(left, col(leftTs))
      .withColumn("__bucket", floor(col(leftTs) / tolerance))
    val rb = right
      .withColumn("__rbucket", floor(col(rightTs) / tolerance))
      .withColumn("__bucket",
        explode(array(rightKeyOffsets.map(o => col("__rbucket") + o): _*)))
      .drop("__rbucket")
    lb.join(broadcast(rb), lb("__bucket") === rb("__bucket") && bandPred, "left")
      .drop("__bucket")
  }

  /** As-of nearest: for each left row, the single right row minimizing
    * |leftTs − rightTs| within tolerance; ties to the earlier right row.
    * Time columns must share units (we standardize on long microseconds).
    * Precondition: left rows are distinct (the rank window partitions by
    * the full left row; duplicated left rows would collapse to one). */
  def asofNearest(left: DataFrame, right: DataFrame,
                  leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    // |r − l| ≤ tol ⇒ floor(r/tol) ∈ {floor(l/tol)−1, …, +1} → right rows
    // carry keys {b−1, b, b+1}
    val joined = bucketJoin(left, right, leftTs, rightTs, tolerance,
      Seq(-1, 0, 1),
      col(rightTs) >= col(leftTs) - tolerance &&
      col(rightTs) <= col(leftTs) + tolerance)
    val rightOrder = right.columns.filter(_ != rightTs).map(col).toSeq
    val w = Window.partitionBy(left.columns.map(col): _*)
      .orderBy(abs(col(leftTs) - col(rightTs)) +: col(rightTs) +: rightOrder: _*)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** As-of backward: most recent right row at-or-before leftTs within
    * tolerance (boundary/brange pattern, stglib/aqd/aqdutils.py:550-560). */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    // l−tol ≤ r ≤ l ⇒ floor(r/tol) ∈ {floor(l/tol)−1, floor(l/tol)} → right
    // rows carry keys {b, b+1}
    val joined = bucketJoin(left, right, leftTs, rightTs, tolerance,
      Seq(0, 1),
      col(rightTs) <= col(leftTs) &&
      col(rightTs) >= col(leftTs) - tolerance)
    val rightOrder = right.columns.filter(_ != rightTs).map(c => col(c).desc).toSeq
    val w = Window.partitionBy(left.columns.map(col): _*)
      .orderBy(col(rightTs).desc +: rightOrder: _*)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** As-of forward: earliest right row at-or-after leftTs within tolerance
    * (the other bracket of linear interpolation). */
  def asofForward(left: DataFrame, right: DataFrame,
                  leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    // l ≤ r ≤ l+tol ⇒ floor(r/tol) ∈ {floor(l/tol), floor(l/tol)+1} → right
    // rows carry keys {b−1, b}
    val joined = bucketJoin(left, right, leftTs, rightTs, tolerance,
      Seq(-1, 0),
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + tolerance)
    val rightOrder = right.columns.filter(_ != rightTs).map(col).toSeq
    val w = Window.partitionBy(left.columns.map(col): _*)
      .orderBy(col(rightTs) +: rightOrder: _*)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
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
    val r0 = right.select(col(rightTs).as("__t0"), col(valCol).as("__y0"))
    val r1 = right.select(col(rightTs).as("__t1"), col(valCol).as("__y1"))
    asofForward(asofBackward(left, r0, leftTs, "__t0", tolerance),
        r1, leftTs, "__t1", tolerance)
      .withColumn(outCol,
        when(col("__t1") === col("__t0"), col("__y0"))
          .otherwise(col("__y0") + (col("__y1") - col("__y0")) *
            ((col(leftTs) - col("__t0")).cast("double") /
             (col("__t1") - col("__t0")).cast("double"))))
      .drop("__t0", "__y0", "__t1", "__y1")
  }

  /** Perfect calendar grid [startUs, endUs) with the given step — the
    * date_range(t0, Δ=1/sr) reindex target. Generated distributed via
    * sequence+explode, not a driver-side loop. */
  def calendarGrid(spark: SparkSession, startUs: Long, endUs: Long,
                   stepUs: Long, colName: String): DataFrame =
    spark.range(1).select(explode(
      sequence(lit(startUs), lit(endUs - 1), lit(stepUs))).as(colName))
}
