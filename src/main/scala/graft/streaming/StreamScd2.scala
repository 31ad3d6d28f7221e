package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming SCD2 dimension maintenance — the unbounded twin of the batch
 * `scd2_history` query: a CDC stream folds per-entity; consecutive
 * same-state events collapse; every state CHANGE closes the previous
 * validity interval and opens the next version. State per entity is one
 * (state, valid_from, version) record — bounded, keyed on the
 * high-cardinality entity id.
 *
 * Emits each interval exactly when it CLOSES (append semantics — a
 * closed interval is immutable, the natural sink contract); the open
 * interval lives in state until the next change. Matches the batch
 * query's closed rows exactly when the stream delivers events in
 * timestamp order per entity (the StreamFunnel parity convention).
 */
object StreamScd2 {

  final case class Ev(userId: Long, ts: Long, eventId: Long, eventType: String)
  final case class Interval(user_id: Long, state: String, valid_from: Long,
                            valid_to: Long, version: Int)
  final case class S(state: String, from: Long, version: Int)

  def track(userId: Long, events: Iterator[Ev],
            state: GroupState[S]): Iterator[Interval] = {
    val out = scala.collection.mutable.Buffer[Interval]()
    var st = state.getOption.orNull
    events.toSeq.sortBy(e => (e.ts, e.eventId)).foreach { e =>
      if (st == null) st = S(e.eventType, e.ts, 1)
      else if (st.state != e.eventType) {
        out += Interval(userId, st.state, st.from, e.ts, st.version)
        st = S(e.eventType, e.ts, st.version + 1)
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }

  /** Append-mode streaming SCD2 over (user_id, ts, event_id, event_type)
    * rows; ts is bigint nanoseconds (the Tables.events convention). */
  def history(df: DataFrame): Dataset[Interval] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[Interval]
    implicit val stEnc = Encoders.product[S]
    implicit val longEnc = Encoders.scalaLong
    df.select(col("user_id").cast("long").as("userId"),
        col("ts").cast("long").as("ts"),
        col("event_id").cast("long").as("eventId"),
        col("event_type").as("eventType"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[S, Interval](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(track _)
  }
}
