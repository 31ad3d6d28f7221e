package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * AQUAscat 1000R acoustic backscatter ingest (stglib/abss.py:14-255): one
 * .mat file per BURST holding
 *
 *  - `BurstTime` (char) + `BurstNumber` — the burst's time coordinate;
 *  - `AbsBinRange` (bins × transducers) — per-transducer bin distances;
 *  - `AbsData` (bins × samples × transducers) — backscatter counts;
 *  - `AbsMean` (bins × transducers) — burst-mean counts;
 *  - `AuxData` (aux samples × channels) named by `AuxChannelName`;
 *  - `AbsTxFrequency` (per transducer) — the MULTI-FREQUENCY axis: the
 *    reference swaps transducer_number for `xdcr_freq` = f/1e6 MHz sorted
 *    ascending (frequency_dim, abss.py:531-550).
 *
 * Long-format output: one row per (time, xdcr_freq, bin, sample) with
 * bindist and counts, plus `amp` = 20·log10(counts·65536) dB (add_amp,
 * abss.py:490-499; zero counts → null). Aux channels land in a second
 * (time, aux_sample, channel…) frame. Multi-file deployments union all
 * burst files and sort by time (mat2cdf, abss.py:14-55).
 */
object Abss {

  final case class AbssData(abs: DataFrame, aux: DataFrame)

  private def num(v: Mat5.MatValue): Option[(Array[Int], Array[Double])] = v match {
    case Mat5.MatNum(dims, data) => Some((dims, data))
    case _ => None
  }

  private def chars(v: Mat5.MatValue): Option[String] = v match {
    case Mat5.MatChars(s) => Some(s)
    case _ => None
  }

  /** One burst .mat → (abs long rows, aux rows). */
  def readBurst(spark: SparkSession, mat: Map[String, Mat5.MatValue]): AbssData = {
    val timeStr = mat.get("BurstTime").flatMap(chars).getOrElse(
      throw new IllegalArgumentException("no BurstTime"))
    // burst times are UTC wall-clock strings; parse timezone-independent
    val time = java.sql.Timestamp.from(
      java.time.LocalDateTime.parse(timeStr.trim.replace(" ", "T"))
        .toInstant(java.time.ZoneOffset.UTC))
    val burstNum = mat.get("BurstNumber").flatMap(num)
      .flatMap(_._2.headOption).map(_.toLong).getOrElse(0L)
    val (brDims, binRange) = mat.get("AbsBinRange").flatMap(num).getOrElse(
      throw new IllegalArgumentException("no AbsBinRange"))
    val nbins = brDims(0)
    val nxdcr = if (brDims.length > 1) brDims(1) else 1
    val freqs = mat.get("AbsTxFrequency").flatMap(num).map(_._2)
      .getOrElse(Array.tabulate(nxdcr)(_.toDouble + 1))
      .map(_ / 1e6) // Hz → MHz (frequency_dim)
    val absData = mat.get("AbsData").flatMap(num)
    val absMean = mat.get("AbsMean").flatMap(num).map(_._2)

    // ascending-frequency transducer order (ds.sortby(xdcr_freq))
    val order = freqs.indices.sortBy(freqs)

    val schema = StructType(Seq(
      StructField("time", TimestampType), StructField("burst_number", LongType),
      StructField("xdcr_freq", DoubleType), StructField("bin", IntegerType),
      StructField("bindist", DoubleType), StructField("sample", IntegerType),
      StructField("abs", DoubleType), StructField("amp", DoubleType),
      StructField("mean_abs", DoubleType)))
    val rows: Seq[Row] = absData match {
      case Some((dims, d)) =>
        // (bins × samples × transducers) column-major: el(b, s, x) =
        // d(b + s*nbins + x*nbins*nsamples)
        val nsamp = if (dims.length > 1) dims(1) else 1
        for (x <- order; b <- 0 until nbins; s <- 0 until nsamp) yield {
          val counts = d(b + s * nbins + x * nbins * nsamp)
          val raw = counts * 65536.0
          Row(time, burstNum, freqs(x), b, binRange(x * nbins + b), s, counts,
            if (raw > 0) 20.0 * math.log10(raw) else null,
            absMean.map(m => m(x * nbins + b)).orNull)
        }
      case None =>
        for (x <- order; b <- 0 until nbins) yield
          Row(time, burstNum, freqs(x), b, binRange(x * nbins + b), 0, null, null,
            absMean.map(m => m(x * nbins + b)).orNull)
    }
    val abs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), schema)

    // aux channels: (aux samples × channels), names from AuxChannelName
    val auxNames: Seq[String] = mat.get("AuxChannelName") match {
      case Some(Mat5.MatCell(items)) =>
        items.collect { case Mat5.MatChars(s) => s.replace(" ", "") }
      case Some(Mat5.MatChars(s)) => Seq(s.replace(" ", ""))
      case _ => Nil
    }
    val aux = mat.get("AuxData").flatMap(num) match {
      case Some((ad, d)) if auxNames.nonEmpty =>
        val nAuxSamp = ad(0)
        val nchan = math.min(if (ad.length > 1) ad(1) else 1, auxNames.length)
        val auxSchema = StructType(
          Seq(StructField("time", TimestampType),
            StructField("aux_sample", IntegerType)) ++
            (0 until nchan).map(k => StructField(auxNames(k), DoubleType)))
        val auxRows = (0 until nAuxSamp).map { s =>
          Row.fromSeq(Seq(time, s) ++
            (0 until nchan).map(k => d(k * nAuxSamp + s)))
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(auxRows.toList, 1), auxSchema)
      case _ =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("time", TimestampType),
            StructField("aux_sample", IntegerType))))
    }
    AbssData(abs, aux)
  }

  /** Deployment dir of burst .mat files → unioned, time-sorted frames. */
  def ingest(spark: SparkSession, dir: String): AbssData = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.toLowerCase.endsWith(".mat")).sortBy(_.getName)
    require(files.nonEmpty, s"no .mat burst files in $dir")
    val parts = files.map(f =>
      readBurst(spark, Mat5.parse(java.nio.file.Files.readAllBytes(f.toPath))))
    AbssData(
      parts.map(_.abs).reduce(_ unionByName _).orderBy("time", "xdcr_freq", "bin", "sample"),
      parts.map(_.aux).reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
        .orderBy("time", "aux_sample"))
  }
}
