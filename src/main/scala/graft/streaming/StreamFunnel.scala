package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming ordered-funnel tracking — the unbounded twin of the batch
 * `event_funnel` query (view → click → purchase, each step the FIRST
 * matching event strictly after the previous step). State per user is
 * exactly three optional timestamps, updated by a single in-order fold
 * over each micro-batch's events — bounded, skew-free (keyed on the
 * high-cardinality user id), and timeout-able for state expiry.
 *
 * Emits the user's funnel row after every batch that CHANGED it (update
 * semantics); the final state matches the batch query exactly when the
 * stream delivers events in timestamp order per user (the BurstAssembler
 * parity convention; out-of-order feeds add a watermark upstream).
 */
object StreamFunnel {

  final case class Ev(userId: Long, eventType: String, ts: Long)
  final case class Funnel(user_id: Long, t_view: Option[Long],
                          t_click: Option[Long], t_purchase: Option[Long],
                          steps_reached: Int)
  final case class FState(v: Option[Long], c: Option[Long], p: Option[Long])

  private[streaming] def step(st: FState, e: Ev): FState = e.eventType match {
    case "view" if st.v.isEmpty => st.copy(v = Some(e.ts))
    case "click" if st.c.isEmpty && st.v.exists(_ < e.ts) =>
      st.copy(c = Some(e.ts))
    case "purchase" if st.p.isEmpty && st.c.exists(_ < e.ts) =>
      st.copy(p = Some(e.ts))
    case _ => st
  }

  private def emit(userId: Long, st: FState): Funnel =
    Funnel(userId, st.v, st.c, st.p,
      if (st.p.isDefined) 3 else if (st.c.isDefined) 2
      else if (st.v.isDefined) 1 else 0)

  def track(userId: Long, events: Iterator[Ev],
            state: GroupState[FState]): Iterator[Funnel] = {
    val st0 = state.getOption.getOrElse(FState(None, None, None))
    val st = events.toSeq.sortBy(e => (e.ts, e.eventType)).foldLeft(st0)(step)
    if (st == st0) Iterator.empty
    else { state.update(st); Iterator.single(emit(userId, st)) }
  }

  /** Update-mode streaming funnel over (user_id, event_type, ts) rows. */
  def funnel(df: DataFrame): Dataset[Funnel] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[Funnel]
    implicit val stEnc = Encoders.product[FState]
    df.select(col("user_id").cast("long").as("userId"),
        col("event_type").as("eventType"), col("ts").cast("long").as("ts"))
      .as[Ev]
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        track)(stEnc, outEnc)
  }
}
