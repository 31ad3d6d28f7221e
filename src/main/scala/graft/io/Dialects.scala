package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dedicated CSV dialects beyond the generic framework reader:
 * Marotte tilt current meter (stglib/mar.py:12-39) and Geolux wave radar
 * Campbell-logger TOA5 files (stglib/glx.py:12-65). Text-in APIs like the
 * other instrument readers; multi-file deployments parallelize via
 * binaryFile with one decode task per file (the reference's glob-concat
 * becomes Spark's native multi-file scan).
 */
object Dialects {

  final case class MarRow(time: String, speed: Double, heading: Double,
                          speed_upper: Double, speed_lower: Double,
                          tilt: Double, direction: Double, batt: Double,
                          temp: Double)

  /** Marotte csv: one skipped title line, then 9 fixed unnamed columns. */
  def readMarotte(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val rows = text.linesIterator.drop(1).filter(_.trim.nonEmpty).map { l =>
      val c = l.split(",").map(_.trim)
      MarRow(c(0), c(1).toDouble, c(2).toDouble, c(3).toDouble, c(4).toDouble,
        c(5).toDouble, c(6).toDouble, c(7).toDouble, c(8).toDouble)
    }.toSeq
    spark.createDataset(rows).toDF()
      .withColumn("time", to_timestamp(col("time")))
  }

  /** Geolux TOA5: line 0 logger metadata, line 1 column names, lines 2-3
    * units/aggregation (dropped), data from line 4. TIMESTAMP → time;
    * RECORD columns int, everything else float (glx.py:38-44). */
  def readGeolux(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val lines = text.linesIterator.toSeq
    require(lines.length >= 4, "TOA5 file too short")
    def split(l: String): Seq[String] =
      l.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
    val names = split(lines(1))
    val data = lines.drop(4).filter(_.trim.nonEmpty).map(split)
    val df = spark.createDataset(data.map(r => r.padTo(names.length, "")))
      .toDF("r")
      .select(names.zipWithIndex.map { case (n, i) => col("r")(i).as(n) }: _*)
    val typed = names.foldLeft(df) { (d, n) =>
      if (n == "TIMESTAMP") d
      else if (n.contains("RECORD")) d.withColumn(n, col(n).cast("long"))
      else d.withColumn(n, col(n).cast("double"))
    }
    typed.withColumn("time", to_timestamp(col("TIMESTAMP")))
      .drop("TIMESTAMP")
      .orderBy("time")
  }
}
