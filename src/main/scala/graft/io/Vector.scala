package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Nortek Vector velocimeter text family (stglib/vec/dat2cdf.py:103-260):
 * `.vhd` burst headers (timestamp components + burst id + noise/probe
 * distances), `.sen` 1-Hz system rows (binary status code → orientation
 * bit), `.dat` per-sample burst velocity rows whose time is the burst start
 * from `.vhd` plus Ensemble/samplingRate — the burst-id equi-join that
 * replaces the reference's per-burst numpy index matching.
 */
object Vector {

  final case class VhdRow(time: String, burst: Long, nsamp: Long,
                          noise1: Double, noise2: Double, noise3: Double,
                          distSVolStartAvg: Double, distSVolEndAvg: Double)

  /** load_vhd (dat2cdf.py:103-136): whitespace rows, time from the first
    * six columns, burst metadata from the rest. */
  def readVhd(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val rows = text.linesIterator.filter(_.trim.nonEmpty).map { l =>
      val c = l.trim.split("\\s+")
      VhdRow(ts(c), c(6).toLong, c(7).toLong,
        c(8).toDouble, c(9).toDouble, c(10).toDouble,
        c(18).toDouble, c(23).toDouble)
    }.toSeq
    spark.createDataset(rows).toDF()
      .withColumn("time", to_timestamp(col("time")))
  }

  final case class SenRow(time: String, errorCode: String, statusCode: Long,
                          orientation: Int, battery: Double,
                          soundspeed: Double, heading: Double, pitch: Double,
                          roll: Double, temperature: Double)

  /** load_sen (dat2cdf.py:139-182): status code is a BINARY string; bit 0
    * is the orientation flag. */
  def readSen(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val rows = text.linesIterator.filter(_.trim.nonEmpty).map { l =>
      val c = l.trim.split("\\s+")
      val status = java.lang.Long.parseLong(c(7), 2)
      SenRow(ts(c), c(6), status, (status & 1L).toInt,
        c(8).toDouble, c(9).toDouble, c(10).toDouble, c(11).toDouble,
        c(12).toDouble, c(13).toDouble)
    }.toSeq
    spark.createDataset(rows).toDF()
      .withColumn("time", to_timestamp(col("time")))
  }

  final case class DatRow(burst: Long, ensemble: Long,
                          vel1: Double, vel2: Double, vel3: Double,
                          amp1: Double, amp2: Double, amp3: Double,
                          snr1: Double, snr2: Double, snr3: Double,
                          cor1: Double, cor2: Double, cor3: Double,
                          pressure: Double)

  /** load_dat sample rows (dat2cdf.py:184-207: burst, ensemble, vel×3,
    * amp×3, SNR×3, corr×3, pressure); time assignment happens in
    * [[withBurstTime]]. */
  def readDat(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val rows = text.linesIterator.filter(_.trim.nonEmpty).map { l =>
      val c = l.trim.split("\\s+")
      DatRow(c(0).toLong, c(1).toLong,
        c(2).toDouble, c(3).toDouble, c(4).toDouble,
        c(5).toDouble, c(6).toDouble, c(7).toDouble,
        c(8).toDouble, c(9).toDouble, c(10).toDouble,
        c(11).toDouble, c(12).toDouble, c(13).toDouble,
        c(14).toDouble)
    }.toSeq
    spark.createDataset(rows).toDF()
  }

  /** Burst-mode time assignment (dat2cdf.py:209-221): sample time = burst
    * start time (from vhd, equi-joined on Burst — vhd is tiny → broadcast)
    * + (Ensemble−1)/samplingRate. */
  def withBurstTime(dat: DataFrame, vhd: DataFrame, samplingRateHz: Double): DataFrame = {
    val starts = vhd.select(col("burst"), col("time").as("__t0"))
    dat.join(broadcast(starts), Seq("burst"), "left")
      .withColumn("time", timestamp_micros(
        unix_micros(col("__t0")) +
          ((col("ensemble") - 1) * (1.0e6 / samplingRateHz)).cast("long")))
      .drop("__t0")
  }

  private def ts(c: Array[String]): String =
    f"${c(2).toInt}%04d-${c(0).toInt}%02d-${c(1).toInt}%02d " +
      f"${c(3).toInt}%02d:${c(4).toInt}%02d:${c(5).toInt}%02d"
}
