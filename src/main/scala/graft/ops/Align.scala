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

  /** As-of nearest: for each left row, the single right row minimizing
    * |leftTs − rightTs| within tolerance; ties to the earlier right row.
    * Time columns must share units (we standardize on long microseconds).
    * Precondition: left rows are distinct (the rank window partitions by
    * the full left row; duplicated left rows would collapse to one). */
  def asofNearest(left: DataFrame, right: DataFrame,
                  leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    val joined = left.join(broadcast(right),
      col(rightTs) >= col(leftTs) - tolerance &&
      col(rightTs) <= col(leftTs) + tolerance, "left")
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
    val joined = left.join(broadcast(right),
      col(rightTs) <= col(leftTs) &&
      col(rightTs) >= col(leftTs) - tolerance, "left")
    val rightOrder = right.columns.filter(_ != rightTs).map(c => col(c).desc).toSeq
    val w = Window.partitionBy(left.columns.map(col): _*)
      .orderBy(col(rightTs).desc +: rightOrder: _*)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Perfect calendar grid [startUs, endUs) with the given step — the
    * date_range(t0, Δ=1/sr) reindex target. Generated distributed via
    * sequence+explode, not a driver-side loop. */
  def calendarGrid(spark: SparkSession, startUs: Long, endUs: Long,
                   stepUs: Long, colName: String): DataFrame =
    spark.range(1).select(explode(
      sequence(lit(startUs), lit(endUs - 1), lit(stepUs))).as(colName))
}
