package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Session-window aggregation: group a keyed event stream into activity
 * sessions separated by more than `gap` of inactivity — the standard behavioral
 * sessionization primitive (and the reference's burst-boundary notion
 * generalized to data-dependent windows).
 *
 * Built on Spark's native `session_window`, so the IDENTICAL plan runs
 * under Structured Streaming: `readStream -> withWatermark(tsCol, ...) ->
 * sessions(...) -> writeStream` emits closed sessions in append mode
 * (proven batch-equivalent in SessionizeSpec). At scale this is one
 * shuffle on the session key; Spark's session-window state merges
 * sessions incrementally with bounded per-key state.
 *
 * Output: (key, session_start_us, session_end_us, n_events) with
 * microsecond longs — integer-exact across engines; end = last event
 * time + gap (Spark session semantics: an event exactly `gap` after the
 * previous one still MERGES into the session; only a strictly larger
 * gap opens a new one).
 */
object Sessionize {

  /** `tsCol` must be a TimestampType column already present on `df`
    * (streaming callers apply `withWatermark` to it before calling). */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
               gap: String): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap).as("__sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        unix_micros(col("__sw.start")).as("session_start_us"),
        unix_micros(col("__sw.end")).as("session_end_us"),
        col("n_events"))
}
