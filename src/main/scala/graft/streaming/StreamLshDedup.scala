package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming MinHash-LSH near-duplicate detection — the unbounded-input twin
 * of the batch candidate generation (ops/Dedup.minhashLshPairs): as
 * documents arrive, emit (earlier_id, new_id, est_jaccard) for every stored
 * document sharing an LSH band whose signature agreement reaches the
 * threshold.
 *
 * Sharding: each document fans out to `bands` rows keyed by (band, band
 * key), so state is per BUCKET — exactly the inverted index any LSH dedup
 * maintains. Per-bucket state holds the (id, signature) of its members;
 * honest LSH parameters keep buckets small, and a GroupStateTimeout /
 * watermark bounds them further on true streams. A pair found via several
 * shared bands is emitted once per band (buckets are independent groups);
 * downstream `dropDuplicates(id_a, id_b)` — or the caller's sink — collapses
 * them, mirroring the batch `.distinct()` on candidates.
 *
 * The signature math is identical to the batch path: distinct char
 * 3-shingles packed base-256 (missing chars → 0, as Spark's `ascii('')`),
 * k = numHashes (a·x+b) mod p minima — so on an id-ordered feed the emitted
 * pair set equals the batch pairs (StreamLshDedupSpec asserts it).
 */
object StreamLshDedup {

  final case class SigDoc(id: Long, band: Int, key: String, sig: Array[Long])
  final case class Pair(id_a: Long, id_b: Long, est_jaccard: Double)

  /** Per-document wide MinHash signature — scalar twin of
    * [[graft.ops.Dedup.wideSignatures]] (same hash family, same shingle
    * packing, same distinct-shingle semantics). */
  def signature(text: String, numHashes: Int): Array[Long] = {
    val params = Dedup.hashParams(numHashes)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seen = scala.collection.mutable.HashSet.empty[Long]
    // iterate CODE POINTS, not UTF-16 units: Spark's substr/ascii are
    // codepoint-based, so astral chars (emoji) would otherwise shingle
    // differently here than in the batch path
    val cps = text.codePoints().toArray
    val n = math.max(cps.length - 2, 1)
    var i = 0
    while (i < n) {
      val c0 = if (i < cps.length) cps(i).toLong else 0L
      val c1 = if (i + 1 < cps.length) cps(i + 1).toLong else 0L
      val c2 = if (i + 2 < cps.length) cps(i + 2).toLong else 0L
      val x = c0 * 65536L + c1 * 256L + c2
      if (seen.add(x)) {
        var j = 0
        while (j < numHashes) {
          val (_, a, b) = params(j)
          // 22-bit-limb modmul, the batch hashAbModP: a·x for codepoint-
          // packed x reaches 2^75, which wraps silently in JVM Long
          val h = ((a * (x >>> 22)) % Dedup.P * (1L << 22)
            + a * (x & ((1L << 22) - 1)) + b) % Dedup.P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    mins
  }

  def bucketBatch(bucket: String, docs: Iterator[SigDoc],
                  state: GroupState[List[(Long, Array[Long])]],
                  numHashes: Int, estThreshold: Double): Iterator[Pair] = {
    var stored = state.getOption.getOrElse(Nil)
    val out = scala.collection.mutable.Buffer.empty[Pair]
    // within-batch determinism: process in id order, so earlier ids are
    // always the stored (id_a) side — matches the batch id_a < id_b rule
    docs.toSeq.sortBy(_.id).foreach { d =>
      stored.foreach { case (sid, ssig) =>
        var eq = 0
        var j = 0
        while (j < numHashes) {
          if (ssig(j) == d.sig(j)) eq += 1
          j += 1
        }
        val est = eq.toDouble / numHashes
        if (est >= estThreshold) out += Pair(sid, d.id, est)
      }
      stored = (d.id, d.sig) :: stored
    }
    state.update(stored)
    out.iterator
  }

  /** Append-mode streaming near-dup pairs over (id, text) rows. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            numHashes: Int, bands: Int, estThreshold: Double): Dataset[Pair] = {
    val rows = numHashes / bands
    implicit val sigEnc = Encoders.product[SigDoc]
    implicit val pairEnc = Encoders.product[Pair]
    implicit val stEnc = Encoders.kryo[List[(Long, Array[Long])]]
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)](Encoders.product[(Long, String)])
      .flatMap { case (id, text) =>
        val sig = signature(text, numHashes)
        (0 until bands).map { b =>
          SigDoc(id, b, sig.slice(b * rows, (b + 1) * rows).mkString(","), sig)
        }
      }
      .groupByKey(d => d.band + "|" + d.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[SigDoc], st: GroupState[List[(Long, Array[Long])]]) =>
          bucketBatch(k, it, st, numHashes, estThreshold))(stEnc, pairEnc)
  }
}
