package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling (BASELINE.json north star): media as opaque
 * `binary` columns + typed metadata, with decode/feature-extraction running
 * per-partition over batches — the Scala analog of a Pandas-UDF
 * `mapInPandas` stage (same batch shape: iterator of rows in, iterator of
 * rows out, constant memory per partition).
 *
 * The actual image/audio codecs are NOT in this container, so [[decodeStub]]
 * is a clearly-marked deterministic fake; the Spark-side plumbing — schema,
 * partitioning, batch iteration, feature vector shape — is real and tested.
 * Swapping in a real decoder changes only the function body.
 */
object Multimodal {

  final case class MediaMeta(
      media_id: Long, n_bytes: Long, width: Int, height: Int, channels: Int)

  final case class MediaFeatures(
      media_id: Long, width: Int, height: Int,
      mean_byte: Double, byte_entropy: Double, histogram: Seq[Double])

  /** STUB decoder: derives fake (width, height, channels) from the byte
    * stream deterministically. A real implementation would parse the
    * image/audio container header here. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val b0 = if (n > 0) bytes(0) & 0xff else 0
    (64 + (b0 % 8) * 32, 64 + ((n % 7) * 32), 3)
  }

  /** Attach decoded metadata per media row — the schema/typing stage. */
  def withMeta(df: DataFrame, idCol: String, blobCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, c) = decodeStub(bytes)
          MediaMeta(id, bytes.length.toLong, w, h, c)
        }
      }
  }

  /** Per-partition batch feature extraction: byte histogram (16 bins),
    * mean, entropy — the feature-vector stage a real pipeline would fill
    * with CNN embeddings / mel spectra. Constant memory per partition. */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, _) = decodeStub(bytes)
          val hist = new Array[Double](16)
          var s = 0L
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            hist(b / 16) += 1.0
            s += b
            i += 1
          }
          val n = math.max(bytes.length, 1)
          var entropy = 0.0
          var j = 0
          while (j < 16) {
            val p = hist(j) / n
            if (p > 0) entropy -= p * math.log(p) / math.log(2)
            hist(j) = p
            j += 1
          }
          MediaFeatures(id, w, h, s.toDouble / n, entropy, hist.toSeq)
        }
      }
  }

  /** Frame sampling for a (fake) video byte stream: every strideBytes-th
    * offset becomes a "frame" row — the explode stage of a real
    * frame-sampling pipeline (bounded output per input row). */
  final case class ResizedRow(media_id: Long, out_w: Int, out_h: Int,
                              resized: Array[Byte], checksum: Long)

  /** STUB nearest-neighbor resize to (outW, outH): treats the blob as a
    * (height × width) fake pixel grid per [[decodeStub]] with
    * pixel(y, x) = bytes[(y·w + x) mod n], samples source pixels at
    * sy = y·h/outH, sx = x·w/outW, and emits the resized blob plus an
    * integer checksum. Real plumbing (schema, per-partition batches,
    * binary out); a real implementation swaps the pixel getter for a
    * decoded raster. */
  def resizeStub(df: DataFrame, idCol: String, blobCol: String,
                 outW: Int, outH: Int): Dataset[ResizedRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, _) = decodeStub(bytes)
          if (bytes.isEmpty) ResizedRow(id, outW, outH, new Array[Byte](outW * outH), 0L)
          else {
          val n = bytes.length
          val out = new Array[Byte](outW * outH)
          var sum = 0L
          var y = 0
          while (y < outH) {
            val sy = y.toLong * h / outH
            var x = 0
            while (x < outW) {
              val sx = x.toLong * w / outW
              val px = bytes(((sy * w + sx) % n).toInt)
              out(y * outW + x) = px
              sum += px & 0xff
              x += 1
            }
            y += 1
          }
          ResizedRow(id, outW, outH, out, sum)
          }
        }
      }
  }

  final case class FrameRow(media_id: Long, frame_idx: Int, offset: Long, probe: Int)

  def sampleFrames(df: DataFrame, idCol: String, blobCol: String,
                   strideBytes: Int): Dataset[FrameRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (0 until bytes.length by strideBytes).iterator.zipWithIndex.map {
          case (off, idx) => FrameRow(id, idx, off.toLong, bytes(off) & 0xff)
        }
      }
  }
}
