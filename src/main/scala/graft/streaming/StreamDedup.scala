package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming exact deduplication — the unbounded-input twin of the batch
 * content dedup (ops/Dedup.exact): keep the FIRST document seen for each
 * content digest. On an ordered feed (ids arrive ascending) this matches
 * the batch rule "smallest id wins", which BurstAssembler-style parity
 * tests assert batch-vs-stream.
 *
 * Built on flatMapGroupsWithState keyed by md5(text): state per digest is
 * ONE boolean (seen), so memory is bounded by distinct-digest cardinality —
 * the same footprint any exact dedup needs. For windows of relevance /
 * state expiry, callers add a watermark and `dropDuplicatesWithinWatermark`
 * semantics follow the same shape.
 */
object StreamDedup {

  final case class Doc(id: Long, digest: String, text: String)
  final case class Kept(id: Long, digest: String, text: String)

  def dedupBatch(digest: String, docs: Iterator[Doc],
                 state: GroupState[Boolean]): Iterator[Kept] = {
    val seen = state.getOption.getOrElse(false)
    if (seen) { docs.foreach(_ => ()); Iterator.empty }
    else {
      // within-batch: smallest id is the canonical survivor
      val first = docs.minBy(_.id)
      state.update(true)
      Iterator.single(Kept(first.id, digest, first.text))
    }
  }

  /** Append-mode streaming dedup over (id, text) rows. */
  def dedup(df: DataFrame, idCol: String, textCol: String): Dataset[Kept] = {
    implicit val docEnc = Encoders.product[Doc]
    implicit val keptEnc = Encoders.product[Kept]
    df.select(col(idCol).cast("long").as("id"),
        md5(col(textCol)).as("digest"), col(textCol).as("text"))
      .as[Doc]
      .groupByKey(_.digest)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[Doc], st: GroupState[Boolean]) =>
          dedupBatch(k, it, st))(Encoders.scalaBoolean, keptEnc)
  }
}
