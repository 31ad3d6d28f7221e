package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * SonTek IQ .mat ingest (stglib/iq.py:172-445): the IQ software exports a
 * FLAT MAT5 file — no Data struct — with `FlowData_*` per-sample series,
 * `FlowSubData_PrfHeader_*` per-profile headers, and `Profile_<beam>_*`
 * (time × bins) matrices. Semantics implemented here:
 *
 *  - `FlowData_SampleTime` is MICROSECONDS SINCE 2000-01-01 (per SonTek;
 *    iq.py:189-196);
 *  - 1-D vars of time length → scalar columns; (time × 4) `SNR`/`Vel` →
 *    per-velbeam array columns; (time × 5) `NoiseLevel` → per-beam array;
 *    `VelXYZ` splits into Vel_X_Center / Vel_Z_Center / Vel_X_Left /
 *    Vel_X_Right (iq.py:216-250);
 *  - FlowSubData/Profile arrays may run one burst longer than time — they
 *    truncate to time length (iq.py:206-208);
 *  - profile matrices go long-format (time, beam, bin, var…) with per-sample
 *    bindist = (blank + cs + bin·cs)/1000 — bin size varies with water
 *    depth, so bindist is per (time, beam, bin), not a dim (create_iqbindist,
 *    iq.py:447-482);
 *  - `recordSubSampleProfiles` = N > 1 places profile row i at time index
 *    i·N (iq.py:298-330);
 *  - `FlowData_` / `FlowSubData_PrfHeader_` prefixes are dropped/renamed to
 *    `Profile_` (update_prefixes, iq.py:485-495).
 */
object Iq {

  /** Epoch micros of 2000-01-01T00:00:00Z. */
  val Y2K_US: Long = 946684800000000L

  final case class IqData(flow: DataFrame, profiles: DataFrame)

  private def num(v: Mat5.MatValue): Option[(Array[Int], Array[Double])] = v match {
    case Mat5.MatNum(dims, data) => Some((dims, data))
    case _ => None
  }

  private def ts(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def read(spark: SparkSession, mat: Map[String, Mat5.MatValue]): IqData = {
    val vars = mat.collect { case (k, v) if !k.contains("__") =>
      num(v).map(k -> _) }.flatten.toMap
    val (_, timeRaw) = vars.getOrElse("FlowData_SampleTime",
      throw new IllegalArgumentException("no FlowData_SampleTime"))
    val ntime = timeRaw.length
    val times = timeRaw.map(us => ts(Y2K_US + us.toLong))

    val profInt = (for {
      setup <- mat.get("System_IqSetup").collect { case s: Mat5.MatStruct => s }
      adv <- setup.fields.get("advancedSetup").collect { case s: Mat5.MatStruct => s }
      v <- adv.fields.get("recordSubSampleProfiles").flatMap(num).map(_._2)
      h <- v.headOption
    } yield math.max(1, h.toInt)).getOrElse(1)

    // ---- flow dataframe: one row per sample -------------------------------
    // column-major with the matrix's own row count as stride (wide arrays
    // may run one burst longer than time; iq.py truncates [0:timelen, :])
    def el(dims: Array[Int], d: Array[Double], t: Int, j: Int) =
      d(j * dims(0) + t)
    val flowKeys = vars.keys.filter(k => k.startsWith("FlowData_") &&
      k != "FlowData_SampleTime").toSeq.sorted
    val scalars = flowKeys.filter(k => vars(k)._2.length >= ntime &&
      vars(k)._1.count(_ > 1) <= 1)
    val velXyz = flowKeys.find(_.contains("VelXYZ"))
    val wides = flowKeys.filter { k =>
      val (dims, _) = vars(k)
      dims.length == 2 && dims(0) >= ntime && dims(1) > 1 && !k.contains("VelXYZ")
    }
    val xyzNames = Seq("Vel_X_Center", "Vel_Z_Center", "Vel_X_Left", "Vel_X_Right")
    val flowSchema = StructType(
      Seq(StructField("time", TimestampType)) ++
        scalars.map(k => StructField(k.stripPrefix("FlowData_"), DoubleType)) ++
        velXyz.toSeq.flatMap(_ => xyzNames.map(n => StructField(n, DoubleType))) ++
        wides.map(k => StructField(k.stripPrefix("FlowData_"), ArrayType(DoubleType))))
    val flowRows = (0 until ntime).map { t =>
      Row.fromSeq(
        Seq(times(t)) ++
          scalars.map(k => vars(k)._2(t)) ++
          velXyz.toSeq.flatMap { k =>
            val (dims, d) = vars(k)
            (0 until 4).map(j => el(dims, d, t, j)) } ++
          wides.map { k =>
            val (dims, d) = vars(k)
            Seq.tabulate(dims(1))(j => el(dims, d, t, j)) })
    }
    val flow = spark.createDataFrame(
      spark.sparkContext.parallelize(flowRows.toList, 1), flowSchema)

    // ---- profile dataframe: (time, beam, bin) long format -----------------
    val profRows = scala.collection.mutable.ArrayBuffer.empty[Row]
    val varNames = scala.collection.mutable.LinkedHashSet.empty[String]
    val perBeam = (0 until 4).map { bm =>
      val pfx = s"Profile_${bm}_"
      val ks = vars.keys.filter(_.startsWith(pfx)).toSeq.sorted
      ks.foreach(k => varNames += k.stripPrefix(pfx))
      bm -> ks
    }.toMap
    val varList = varNames.toSeq
    for (bm <- 0 until 4) {
      val ks = perBeam(bm)
      if (ks.nonEmpty) {
        val nbins = ks.map(k => vars(k)._1(1)).max
        val nprof = ks.map(k => vars(k)._1(0)).min
        val blank = vars.get(s"FlowSubData_PrfHeader_${bm}_BlankingDistance").map(_._2)
        val cs = vars.get(s"FlowSubData_PrfHeader_${bm}_CellSize").map(_._2)
        for (i <- 0 until nprof; tIdx = i * profInt; if tIdx < ntime;
             b <- 0 until nbins) {
          val bindist = (for (bl <- blank; c <- cs) yield
            (bl(i) + c(i) + b * c(i)) / 1000.0).getOrElse(Double.NaN)
          profRows += Row.fromSeq(
            Seq(times(tIdx), bm, b, bindist) ++ varList.map { vn =>
              perBeam(bm).find(_ == s"Profile_${bm}_$vn") match {
                case Some(k) =>
                  val (dims, d) = vars(k)
                  // column-major with the MATRIX's own row count as stride
                  // (profile arrays may run longer than time)
                  if (b < dims(1) && i < dims(0)) d(b * dims(0) + i) else Double.NaN
                case None => Double.NaN
              }
            })
        }
      }
    }
    val profSchema = StructType(
      Seq(StructField("time", TimestampType), StructField("beam", IntegerType),
        StructField("bin", IntegerType), StructField("bindist", DoubleType)) ++
        varList.map(v => StructField(v, DoubleType)))
    val profiles = spark.createDataFrame(
      spark.sparkContext.parallelize(profRows.toList, 1), profSchema)
    IqData(flow, profiles)
  }

  /** mm/s → m/s on every *Vel* column (vel_to_ms, iq.py:497-507). */
  def velToMs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.columns.filter(_.contains("Vel")).foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case ArrayType(_, _) =>
          d.withColumn(c, transform(col(c), x => x / 1000.0))
        case _ => d.withColumn(c, col(c) / 1000.0)
      }
    }
  }
}
