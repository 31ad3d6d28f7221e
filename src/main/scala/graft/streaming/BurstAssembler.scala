package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming burst assembly — the unbounded-input twin of the batch
 * continuous→burst reshape (ops/Burst.fromContinuous; make_wave_bursts_mi,
 * stglib/core/waves.py:2037-2091). The reference processes "continuous
 * mode" files in batch; on a live feed the same semantics are a stateful
 * streaming operator: per series, buffer samples until `nsamps` arrive,
 * then emit one complete burst row (Append mode) and roll the state.
 *
 * State is bounded by construction: at most `nsamps − 1` samples per
 * series key ride in state between triggers — the KeyValueGroupedDataset
 * + flatMapGroupsWithState shape the task brief calls out for custom
 * streaming state. Within-batch arrival order is normalized by (ts) sort;
 * cross-batch lateness is the caller's watermark concern (same contract
 * as the reference's calendar regularization with tolerance).
 */
object BurstAssembler {

  final case class Sample(series: Long, ts: Long, value: Double)
  final case class BurstState(nextBurst: Long, ts: Array[Long],
                              values: Array[Double])
  final case class BurstOut(series: Long, burst: Long, startTs: Long,
                            values: Array[Double])

  def assembleBatch(series: Long, samples: Iterator[Sample],
                    state: GroupState[BurstState], nsamps: Int): Iterator[BurstOut] = {
    val prev = state.getOption.getOrElse(BurstState(0L, Array.empty, Array.empty))
    val incoming = samples.toArray.sortBy(_.ts)
    var ts = prev.ts ++ incoming.map(_.ts)
    var vs = prev.values ++ incoming.map(_.value)
    var burst = prev.nextBurst
    val out = scala.collection.mutable.ArrayBuffer.empty[BurstOut]
    while (ts.length >= nsamps) {
      out += BurstOut(series, burst, ts.head, vs.take(nsamps))
      ts = ts.drop(nsamps)
      vs = vs.drop(nsamps)
      burst += 1
    }
    state.update(BurstState(burst, ts, vs))
    out.iterator
  }

  /** Append-mode stateful assembly: one output row per completed burst. */
  def assemble(ds: Dataset[Sample], nsamps: Int): Dataset[BurstOut] = {
    implicit val outEnc = Encoders.product[BurstOut]
    implicit val stEnc = Encoders.product[BurstState]
    ds.groupByKey(_.series)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (k: Long, it: Iterator[Sample], st: GroupState[BurstState]) =>
          assembleBatch(k, it, st, nsamps))
  }
}
