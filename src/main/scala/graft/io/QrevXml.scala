package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * QRev XML discharge-transect reader (stglib/indexvel.py:19-117): one row
 * per transect with discharge components, geometry, and the mid-point time
 * used to join against the index-velocity series for the rating
 * (linregress, covered by the `linregress` query).
 */
object QrevXml {

  final case class Transect(
      filename: String, start_us: Long, end_us: Long, time_us: Long,
      q: Double, qTop: Double, qMiddle: Double, qBottom: Double,
      qLeft: Double, qRight: Double,
      area: Double, width: Double, qOverA: Double,
      leftDistance: Double, rightDistance: Double)

  private def us(s: String): Long =
    java.time.LocalDateTime.parse(s.trim.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  /** Parse the QRev document → transect rows; negateq flips the discharge
    * sign convention (per-transect when the list form is used). */
  def parseTransects(xml: scala.xml.NodeSeq,
                     negateq: Seq[Boolean] = Nil): Seq[Transect] = {
    val transects = (xml \\ "Transect").toSeq
    transects.zipWithIndex.map { case (t, i) =>
      def txt(path: String*): String =
        path.foldLeft(t: scala.xml.NodeSeq)((n, p) => n \ p).text.trim
      val neg = negateq.lift(i).getOrElse(false)
      val sgn = if (neg) -1.0 else 1.0
      val s = us(txt("StartDateTime")); val e = us(txt("EndDateTime"))
      Transect(
        filename = txt("Filename"),
        start_us = s, end_us = e, time_us = (s + e) / 2,
        q = sgn * txt("Discharge", "Total").toDouble,
        qTop = txt("Discharge", "Top").toDouble,
        qMiddle = txt("Discharge", "Middle").toDouble,
        qBottom = txt("Discharge", "Bottom").toDouble,
        qLeft = txt("Discharge", "Left").toDouble,
        qRight = txt("Discharge", "Right").toDouble,
        area = txt("Other", "Area").toDouble,
        width = txt("Other", "Width").toDouble,
        qOverA = sgn * txt("Other", "QoverA").toDouble,
        leftDistance = txt("Edge", "LeftDistance").toDouble,
        rightDistance = txt("Edge", "RightDistance").toDouble)
    }
  }

  /** QRev files are small summary documents: parse on the driver,
    * distribute the transect rows. */
  def read(spark: SparkSession, path: String,
           negateq: Seq[Boolean] = Nil): DataFrame = {
    import spark.implicits._
    parseTransects(scala.xml.XML.loadFile(path), negateq).toDF()
  }
}
