package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sequoia LISST-200X exported-CSV reader (stglib/lisst.py:92-165): 36
 * volume-concentration columns (vc01..vc36) followed by 26 named scalar
 * columns; timestamp assembled from Y/M/D/H/M/S components; plus the
 * static 36-ring particle-size dimension table (get_ringsizes,
 * lisst.py:278-421 — values from the LISST-200X User's Manual v2.3
 * Appendix B, 1.00–500 µm logarithmic bins).
 *
 * Output is long-format (time, ring, vc) joined to the ring-size table —
 * broadcast-sized (36 rows), the canonical static dimension join.
 */
object Lisst {

  val ScalarCols: Seq[String] = Seq(
    "LaserTransmissionSensor", "SupplyVoltage", "AnalogInput1",
    "LaserReferenceSensor", "Depth", "Temperature",
    "Year", "Month", "Day", "Hour", "Minute", "Second",
    "AnalogInput2", "MeanDiameter", "TotalVolumeConcentration",
    "RelativeHumidity", "AccelerometerX", "AccelerometerY", "AccelerometerZ",
    "RawPressureMSB", "RawPressureLSBs", "AmbientLight", "AnalogInput3",
    "ComputedOpticalTransmissionOverPath", "BeamAttenuation")

  val RingSizeMedian: Array[Double] = Array(
    1.21, 1.60, 1.89, 2.23, 2.63, 3.11, 3.67, 4.33, 5.11, 6.03, 7.11, 8.39,
    9.90, 11.7, 13.8, 16.3, 19.2, 22.7, 26.7, 31.6, 37.2, 43.9, 51.9, 61.2,
    72.2, 85.2, 101, 119, 140, 165, 195, 230, 273, 324, 386, 459)
  val RingSizeUpper: Array[Double] = Array(
    1.48, 1.74, 2.05, 2.42, 2.86, 3.38, 3.98, 4.70, 5.55, 6.55, 7.72, 9.12,
    10.8, 12.7, 15.0, 17.7, 20.9, 24.6, 29.1, 34.3, 40.5, 47.7, 56.3, 66.5,
    78.4, 92.6, 109, 129, 152, 180, 212, 250, 297, 354, 420, 500)
  val RingSizeLower: Array[Double] = Array(
    1.00, 1.48, 1.74, 2.05, 2.42, 2.86, 3.38, 3.98, 4.70, 5.55, 6.55, 7.72,
    9.12, 10.8, 12.7, 15.0, 17.7, 20.9, 24.6, 29.1, 34.3, 40.5, 47.7, 56.3,
    66.5, 78.4, 92.6, 109, 129, 152, 180, 212, 250, 297, 354, 420)

  /** The static ring dimension table: (ring 1..36, RSmedian, RSlower,
    * RSupper) — always broadcast in joins. */
  def ringSizes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (1 to 36).map(r => (r, RingSizeMedian(r - 1), RingSizeLower(r - 1),
        RingSizeUpper(r - 1)))
      .toDF("ring", "RSmedian", "RSlower", "RSupper")
  }

  private def parsed(spark: SparkSession, csvText: String): DataFrame = {
    import spark.implicits._
    val vcs = (1 to 36).map(n => f"vc$n%02d")
    val all = vcs ++ ScalarCols
    val lines = csvText.linesIterator.filter(_.trim.nonEmpty).toSeq.toDS()
    val raw = spark.read.option("ignoreLeadingWhiteSpace", "true")
      .csv(lines).toDF(all: _*)
    val ts = to_timestamp(concat_ws(" ",
      concat_ws("-", col("Year"), col("Month"), col("Day")),
      concat_ws(":", col("Hour"), col("Minute"), col("Second"))))
    raw.withColumn("time", ts)
      .drop("Year", "Month", "Day", "Hour", "Minute", "Second")
  }

  /** Scalar engineering variables, one row per sample time. */
  def readScalars(spark: SparkSession, csvText: String): DataFrame = {
    val nonTime = ScalarCols.filterNot(
      Seq("Year", "Month", "Day", "Hour", "Minute", "Second").contains)
    parsed(spark, csvText).select(col("time") +:
      nonTime.map(c => col(c).cast("double").as(c)): _*)
  }

  /** Volume concentration, long-format (time, ring, vc) joined to the
    * broadcast ring-size table. */
  def readVolumeConcentration(spark: SparkSession, csvText: String): DataFrame = {
    val vcs = (1 to 36).map(n => f"vc$n%02d")
    val stacked = parsed(spark, csvText).select(col("time"),
      explode(array(vcs.zipWithIndex.map { case (c, i) =>
        struct(lit(i + 1).as("ring"), col(c).cast("double").as("vc"))
      }: _*)).as("r"))
      .select(col("time"), col("r.ring").as("ring"), col("r.vc").as("vc"))
    stacked.join(broadcast(ringSizes(spark)), Seq("ring"))
  }
}
