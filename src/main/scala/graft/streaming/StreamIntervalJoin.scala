package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-time interval join (view → conversion within a lag bound) — the
 * stream-stream join shape: both sides watermarked, the time-range
 * predicate bounds join state so Structured Streaming can evict rows
 * once the watermark passes `v_time + maxLag` (attribution windows,
 * impression↔click joins, request↔response stitching).
 *
 * ONE plan serves batch and streaming: `withWatermark` is a no-op on
 * static inputs, so the registered batch query and the streaming parity
 * spec run literally the same function. The equi-key (user) carries the
 * shuffle; the range predicate is evaluated post-join and also drives
 * streaming state cleanup on BOTH sides.
 */
object StreamIntervalJoin {

  /** Inputs: (user_id, event_id, event_time TIMESTAMP) on both sides.
    * Output: (user_id, view_id, purchase_id, lag_ms) for conversions in
    * (v_time, v_time + maxLag]. */
  def viewToConversion(views: DataFrame, conversions: DataFrame,
                       maxLag: String = "1 hour",
                       watermark: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"),
        col("event_id").as("view_id"), col("event_time").as("v_time"))
      .withWatermark("v_time", watermark)
    val p = conversions.select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("event_time").as("p_time"))
      .withWatermark("p_time", watermark)
    v.join(p, col("v_user") === col("p_user") &&
        col("p_time") > col("v_time") &&
        col("p_time") <= col("v_time") + expr(s"INTERVAL $maxLag"))
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        expr("(unix_micros(p_time) - unix_micros(v_time)) div 1000")
          .as("lag_ms"))
  }

  /** LEFT OUTER variant — the "did this impression convert at all?" shape.
    * Streaming semantics: a view's null row can only be emitted once the
    * watermark proves no conversion can still arrive (v_time + maxLag <
    * watermark), so unmatched rows trail the data by the lag bound plus
    * the watermark delay; the batch run of the SAME plan emits them
    * immediately. Output adds `converted` (0/1). */
  def viewToConversionOuter(views: DataFrame, conversions: DataFrame,
                            maxLag: String = "1 hour",
                            watermark: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"),
        col("event_id").as("view_id"), col("event_time").as("v_time"))
      .withWatermark("v_time", watermark)
    val p = conversions.select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("event_time").as("p_time"))
      .withWatermark("p_time", watermark)
    v.join(p, col("v_user") === col("p_user") &&
        col("p_time") > col("v_time") &&
        col("p_time") <= col("v_time") + expr(s"INTERVAL $maxLag"),
        "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        expr("(unix_micros(p_time) - unix_micros(v_time)) div 1000")
          .as("lag_ms"),
        col("purchase_id").isNotNull.cast("int").as("converted"))
  }
}
