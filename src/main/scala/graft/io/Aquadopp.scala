package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Nortek Aquadopp text-file family (stglib/aqd/hdr2cdf.py:1-143,
 * stglib/aqd/aqdutils.py:675-921): `.hdr` keyword metadata (fixed 38-char
 * label column, unit suffix stripped), `.sen` whitespace sensor rows
 * (M D Y H M S … battery heading pitch roll pressure temperature analog1
 * analog2), and `.aN`/`.vN` whitespace (time × cell) amplitude/velocity
 * matrices emitted long-format as (ens, bin, value).
 *
 * HR instruments ("Extended velocity range" present) key their shared
 * attributes with an `AQDHR` prefix, mirroring the reference's shim.
 */
object Aquadopp {

  private def v(row: String): String = if (row.length > 38) row.drop(38).trim else ""
  private def num(row: String, unit: String): String = {
    val s = v(row)
    val i = s.indexOf(unit)
    (if (i >= 0) s.take(i) else s).trim
  }

  /** read_aqd_hdr subset (aqdutils.py:675-921): the config keys the
    * processing pipeline consumes. */
  def readHdr(text: String): Map[String, Any] = {
    val hr = text.contains("Extended velocity range")
    val shim = if (hr) "HR" else ""
    val m = scala.collection.mutable.Map.empty[String, Any]
    val lines = text.linesIterator.toVector
    lines.zipWithIndex.foreach { case (row, idx) =>
      if (row.contains("Transformation matrix")) {
        // 3×3 beam-geometry matrix spans the label row + two continuation
        // rows (aqdutils.py:873-877); stored row-major, comma-joined.
        // Pure LOOKAHEAD — nothing is consumed, so a truncated/misaligned
        // header never swallows keyword rows, and numeric continuation
        // rows match no keyword branch below anyway.
        val nine = (idx until math.min(idx + 3, lines.length))
          .flatMap(i => v(lines(i)).split("\\s+").filter(_.nonEmpty))
        if (nine.length == 9 && nine.forall(_.matches("-?\\d+(\\.\\d+)?([eE][-+]?\\d+)?")))
          m("AQDTransMatrix") = nine.map(_.toDouble).mkString(",")
      }
      else if (row.contains("Number of checksum errors"))
        m("AQDNumberOfChecksumErrors") = num(row, " ").toInt
      else if (row.contains("Profile interval"))
        m("AQDProfileInterval") = num(row, " sec").toInt
      else if (row.contains("Number of cells"))
        m(s"AQD${shim}NumberOfCells") = v(row).toInt
      else if (row.startsWith("Cell size"))
        m(s"AQD${shim}CellSize") = num(row, if (hr) " mm" else " cm").toInt
      else if (row.contains("Blanking distance"))
        m(s"AQD${shim}BlankingDistance") = num(row, " m").toDouble
      else if (row.contains("Measurement/Burst interval"))
        m("AQDHRMeasurementBurstInterval") = num(row, " sec").toInt
      else if (row.contains("Samples per burst"))
        m(s"AQD${shim}SamplesPerBurst") = v(row).toInt
      else if (row.contains("Average interval"))
        m(s"AQD${shim}AverageInterval") = num(row, " sec").toInt
      else if (row.contains("Coordinate system"))
        m(s"AQD${shim}CoordinateSystem") = v(row)
      else if (row.contains("Number of beams"))
        m(s"AQD${shim}NumberOfBeams") = v(row).toInt
      else if (row.contains("Orientation"))
        m(s"AQD${shim}Orientation") = v(row)
      else if (row.contains("Sound speed"))
        m(s"AQD${shim}SoundSpeed") = v(row)
      else if (row.contains("Salinity"))
        m(s"AQD${shim}Salinity") = v(row)
      else if (row.contains("Deployment name"))
        m(s"AQD${shim}DeploymentName") = v(row)
      else if (row.contains("Wave - Number of samples"))
        m("WaveNumberOfSamples") = v(row).toInt
      else if (row.contains("Wave - Interval"))
        m("WaveInterval") = num(row, " sec").toInt
      else if (row.contains("Transmit pulse length"))
        m("AQDTransmitPulseLength") = num(row, " m").toDouble
    }
    m.toMap
  }

  final case class Sen(ens: Long, time: String, battery: Double,
                       heading: Double, pitch: Double, roll: Double,
                       pressure: Double, temperature: Double,
                       analog1: Double, analog2: Double)

  /** load_sen (hdr2cdf.py:68-114): whitespace columns, time assembled from
    * M/D/Y H:M:S, analog inputs scaled counts→volts (×5/65535). */
  def readSen(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val rows = text.linesIterator.filter(_.trim.nonEmpty).zipWithIndex.map {
      case (line, i) =>
        val c = line.trim.split("\\s+")
        val ts = f"${c(2).toInt}%04d-${c(0).toInt}%02d-${c(1).toInt}%02d " +
          f"${c(3).toInt}%02d:${c(4).toInt}%02d:${c(5).toInt}%02d"
        Sen(i.toLong, ts, c(8).toDouble, c(10).toDouble, c(11).toDouble,
          c(12).toDouble, c(13).toDouble, c(14).toDouble,
          c(15).toDouble * 5 / 65535, c(16).toDouble * 5 / 65535)
    }.toSeq
    spark.createDataset(rows).toDF()
      .withColumn("time", to_timestamp(col("time")))
  }

  /** load_amp_vel matrices (hdr2cdf.py:117-143): one whitespace row per
    * ensemble, one column per cell → long (ens, bin, value); bindist =
    * blanking + cellSize/2 + bin·cellSize via Physics.binDist downstream. */
  def readMatrix(spark: SparkSession, text: String, valueCol: String): DataFrame = {
    import spark.implicits._
    val rows = text.linesIterator.filter(_.trim.nonEmpty).zipWithIndex.flatMap {
      case (line, i) =>
        line.trim.split("\\s+").zipWithIndex.map { case (x, bin) =>
          (i.toLong, bin, x.toDouble)
        }
    }.toSeq
    spark.createDataset(rows).toDF("ens", "bin", valueCol)
  }

  /** Aquadopp waves `.wad` (stglib/aqd/wvswad2cdf.py:152-206): whitespace
    * rows; columns 2,5,6,7,9,10,11 are pressure, three velocities (named by
    * coordinate system), three amplitudes. Rows reshape to (burst, sample)
    * by WaveNumberOfSamples, truncated to the last full burst. */
  def readWad(spark: SparkSession, text: String, samplesPerBurst: Int,
              coordSystem: String): DataFrame = {
    import spark.implicits._
    val vels = velNames(coordSystem)
    val rows = text.linesIterator.filter(_.trim.nonEmpty).zipWithIndex.map {
      case (line, i) =>
        val c = line.trim.split("\\s+")
        (i.toLong / samplesPerBurst, i.toLong % samplesPerBurst,
          c(2).toDouble, c(5).toDouble, c(6).toDouble, c(7).toDouble,
          c(9).toDouble, c(10).toDouble, c(11).toDouble)
    }.toSeq
    val nburst = rows.length / samplesPerBurst // truncate to full bursts
    spark.createDataset(rows.take(nburst * samplesPerBurst))
      .toDF("burst", "sample", "pressure",
        vels(0), vels(1), vels(2), "amp1", "amp2", "amp3")
  }

  /** Velocity variable names by coordinate system (hdr2cdf.py:135-141). */
  def velNames(coordSystem: String): Seq[String] = coordSystem match {
    case "BEAM" => Seq("VEL1", "VEL2", "VEL3")
    case "ENU"  => Seq("U", "V", "W")
    case "XYZ"  => Seq("X", "Y", "Z")
    case other  => throw new IllegalArgumentException(s"unknown system $other")
  }
}
