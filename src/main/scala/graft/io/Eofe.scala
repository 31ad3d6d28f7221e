package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * EofE ECHOLOGGER EA400 `.log` reader (stglib/eofe.py:157-302): a `#Key
 * value` header block up to `##DataStart`, per-ping annotation lines
 * (`#TimeUTC`, `#Altitude,m`, ...), and raw echo counts between
 * `##DataStart`/`##DataEnd`, reshaped (time, sample, bins) from
 * Pulses_in_series × Bin_count.
 *
 * Output is long-format: one row per (burst, sample) for point data; one
 * row per (burst, sample, bin) for profile counts — the layout every graft
 * profile operator consumes. Files parallelize via binaryFile (one decode
 * task per deployment file).
 */
object Eofe {

  /** read_ea_instmet (eofe.py:157-202). */
  def instMeta(lines: Iterator[String]): Map[String, Any] = {
    val m = scala.collection.mutable.Map.empty[String, Any]
    val it = lines.buffered
    var done = false
    while (it.hasNext && !done) {
      val row = it.next()
      if (row.contains("##DataStart")) done = true
      else {
        val dat = row.trim.split("\\s+")
        if (row.contains("#DeviceID")) {
          m("EADeviceID") = row.drop(10); m("serial_number") = dat(1)
        } else if (row.contains("#NSamples")) m("EABin_count") = dat(1).toInt
        else if (row.contains("#Resolution,m")) m("EABin_size_m") = dat(1).toDouble
        else if (row.contains("#SoundSpeed,mps")) m("EASoundSpeed_mps") = dat(1).toDouble
        else if (row.contains("#Tx_Frequency,Hz")) m("EATx_Frequency_Hz") = dat(1).toDouble
        else if (row.contains("#Range,m")) m("EARange_m") = dat(1).toDouble
        else if (row.contains("#Pulse period,sec")) m("EAPulse_period_sec") = dat(2).toDouble
        else if (row.contains("#Pulses in series,num")) m("EAPulses_in_series_num") = dat(3).toInt
        else if (row.contains("#Interval between series,sec")) m("EAInterval_between_series_sec") = dat(3).toDouble
        else if (row.contains("#Threshold,%")) m("EAThreshold_percent") = dat(1).toInt
        else if (row.contains("#Offset,m")) m("EAOffset_m") = dat(1).toDouble
        else if (row.contains("#Deadzone,m")) m("EADeadzone_m") = dat(1).toDouble
        else if (row.contains("#PulseLength,uks")) m("EAPulseLength_microsec") = dat(1).toDouble
        else if (row.contains("#TVG_Gain,dB")) m("EATVG_Gain_dB") = dat(1).toDouble
        else if (row.contains("#TVG_Slope,dB/km")) m("EATVG_Slope_dBkm") = dat(1).toDouble
        else if (row.contains("#TVG_Mode")) m("EATVG_Mode") = dat(1).toInt
        else if (row.contains("#OutputMode")) m("EAOutputMode") = dat(1).toInt
      }
    }
    m.toMap
  }

  final case class PointRow(burst: Long, sample: Long, timeUtc: String,
                            ping: Double, pingNumInSeries: Double,
                            altitudeM: Double, temperatureC: Double,
                            pitchDeg: Double, rollDeg: Double)

  /** load_ea_point (eofe.py:204-260): per-ping annotation lines grouped
    * into (burst, sample) by Pulses_in_series_num. */
  def pointRows(lines: Seq[String], meta: Map[String, Any]): Seq[PointRow] = {
    val samples = meta("EAPulses_in_series_num").asInstanceOf[Int]
    val time = scala.collection.mutable.ArrayBuffer.empty[String]
    val ping = scala.collection.mutable.ArrayBuffer.empty[Double]
    val pns = scala.collection.mutable.ArrayBuffer.empty[Double]
    val alt = scala.collection.mutable.ArrayBuffer.empty[Double]
    val temp = scala.collection.mutable.ArrayBuffer.empty[Double]
    val pitch = scala.collection.mutable.ArrayBuffer.empty[Double]
    val roll = scala.collection.mutable.ArrayBuffer.empty[Double]
    lines.foreach { row =>
      val dat = row.trim.split("\\s+")
      if (row.contains("#TimeUTC")) time += dat(1) + " " + dat(2)
      else if (row.contains("#Ping  ")) ping += dat(1).toDouble
      else if (row.contains("#Ping num in series")) pns += dat(4).toDouble
      else if (row.contains("#Altitude,m")) alt += dat(1).toDouble
      else if (row.contains("#Temperature")) temp += dat(1).toDouble
      else if (row.contains("#Pitch,deg")) pitch += dat(1).toDouble
      else if (row.contains("#Roll,deg")) roll += dat(1).toDouble
    }
    val n = time.length
    require(n % samples == 0,
      s"ping count $n not a multiple of Pulses_in_series $samples")
    (0 until n).map { i =>
      PointRow(i / samples, i % samples, time(i), ping(i), pns(i), alt(i),
        temp(i), pitch(i), roll(i))
    }
  }

  final case class ProfileRow(burst: Long, sample: Long, bin: Long, counts: Double)

  /** load_ea_profile (eofe.py:263-302): echo counts between ##DataStart and
    * ##DataEnd, reshaped (time, sample, bins). */
  def profileRows(lines: Seq[String], meta: Map[String, Any]): Seq[ProfileRow] = {
    val samples = meta("EAPulses_in_series_num").asInstanceOf[Int]
    val nbins = meta("EABin_count").asInstanceOf[Int]
    val counts = scala.collection.mutable.ArrayBuffer.empty[Double]
    var in = false
    lines.foreach { row =>
      val r = row.trim
      if (r == "##DataStart") in = true
      else if (r == "##DataEnd") in = false
      else if (in) counts += r.toDouble
    }
    require(counts.length % (samples * nbins) == 0,
      s"${counts.length} counts not a multiple of $samples x $nbins")
    counts.indices.map { i =>
      val perBurst = samples * nbins
      ProfileRow(i / perBurst, (i % perBurst) / nbins, i % nbins, counts(i))
    }
  }

  /** Point data of one `.log` byte image as a DataFrame. */
  def readPoint(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val lines = new String(bytes, "US-ASCII").linesIterator.toSeq
    val meta = instMeta(lines.iterator)
    import spark.implicits._
    spark.createDataset(pointRows(lines, meta)).toDF()
  }

  /** Profile echo counts of one `.log` byte image as a DataFrame. */
  def readProfile(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val lines = new String(bytes, "US-ASCII").linesIterator.toSeq
    val meta = instMeta(lines.iterator)
    import spark.implicits._
    spark.createDataset(profileRows(lines, meta)).toDF()
  }
}
