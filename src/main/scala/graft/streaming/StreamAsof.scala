package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming as-of join: align each left (measurement) row with the
 * nearest right (aux series) row within a tolerance — the streaming form
 * of `Align.asofNearest` (the reference's
 * `met["atmpres"].reindex_like(method="nearest", tolerance=...)`,
 * stglib/aqd/aqdutils.py:93-118), for live atmospheric-correction /
 * sensor-fusion feeds.
 *
 * Shape: the batch sub-bucket candidate design made watermark-evictable.
 * Both sides bucket by ⌊ts / tolerance⌋; the right side replicates into
 * its bucket and both neighbors (any right row within tolerance of a left
 * row lands in the left row's bucket by construction), the stream-stream
 * equi-join on bucket + the |Δt| ≤ tolerance range predicate bounds join
 * state, and a per-left-row `min_by` over (|Δt|, rightTs, payload) picks
 * the nearest candidate with ties to the earlier right row — exactly the
 * batch operator's ordering. The aggregation keys on the watermarked left
 * event time, so each left row's result emits once the watermark proves
 * no nearer candidate can still arrive. Two stateful operators chained in
 * append mode — supported by Spark's multi-stateful-operator pipelines.
 *
 * ONE plan serves batch and streaming (`withWatermark` is a no-op on
 * static inputs): the parity spec runs literally this function both ways.
 * Two documented semantic differences from the batch operator:
 *  - matched rows only (the inner-join form): a left row with no
 *    candidate in tolerance produces nothing, where the batch
 *    operator's left join yields a null payload;
 *  - DUPLICATE left rows collapse: the final per-left-row `groupBy`
 *    keys on ALL left columns, so two byte-identical left rows (same
 *    timestamp and payload) emit ONE output row, where the batch join
 *    emits one row each. Left feeds carrying true duplicates must
 *    disambiguate upstream (a sequence/arrival id column added before
 *    the join makes each row a distinct group and restores 1:1).
 */
object StreamAsof {

  /** Inputs: left (leftTs TIMESTAMP + payload), right (rightTs TIMESTAMP +
    * payload). Output: left columns + the nearest right row's columns.
    * Column sets must be disjoint. */
  def asofNearest(left: DataFrame, right: DataFrame,
                  leftTs: String, rightTs: String,
                  toleranceSec: Long, watermark: String = "10 minutes"): DataFrame = {
    require(toleranceSec > 0, "tolerance must be positive")
    val bUs = toleranceSec * 1000000L
    val l = left.withWatermark(leftTs, watermark)
      .withColumn("__lb", expr(s"floor(unix_micros($leftTs) / ${bUs}L)"))
    val r = right.withWatermark(rightTs, watermark)
      .withColumn("__rb", explode(expr(
        s"array(floor(unix_micros($rightTs) / ${bUs}L) - 1, " +
        s"floor(unix_micros($rightTs) / ${bUs}L), " +
        s"floor(unix_micros($rightTs) / ${bUs}L) + 1)")))
    val joined = l.join(r,
        col("__lb") === col("__rb") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $toleranceSec SECOND") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $toleranceSec SECOND"))
      .drop("__lb", "__rb")
    // nearest candidate per left row: |Δt| ascending, ties to the earlier
    // right row (the batch Align.asofNearest ordering)
    val ord = struct(
      abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs))) +:
        col(rightTs) +: right.columns.filter(_ != rightTs).map(col): _*)
    val payload = struct(right.columns.map(col): _*)
    joined
      .groupBy(left.columns.map(col): _*)
      .agg(min_by(payload, ord).as("__best"))
      .select(left.columns.map(col) ++
        right.columns.map(c => col(s"__best.$c").as(c)): _*)
  }
}
