package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Nortek Signature .mat deployment pipeline (stglib/sig/mat2cdf.py:22-790):
 * a Signature export is one MAT5 file per chunk (`basefile_1.mat`,
 * `basefile_2.mat`, …), each holding a `Config` struct and a `Data` struct
 * whose keys are `<DataType>_<Variable>` — e.g. `Burst_Time`,
 * `Burst_Pressure` (time), `Burst_VelBeam1` (time × cells),
 * `IBurst_AHRSRotationMatrix` (time × 9). This module:
 *
 *  - discovers the per-datatype groups by their `_Time` keys (the reference
 *    enumerates Burst / IBurst[HR] / EchoSounder / Average / Alt_* by hand;
 *    discovery is equivalent and covers the same set);
 *  - converts MATLAB datenums to timestamps (`matlab2datetime`);
 *  - attaches bin geometry from the Config blanking/cell-size/NCells keys
 *    (bindist = blank + cs/2 + bin·cs, mat2cdf.py:29-100);
 *  - long-formats (time × cells) matrices to (time, bin, bindist, value)
 *    rows, keeps per-time scalars as columns and fixed-width aux matrices
 *    (rotation/magnetometer/accelerometer) as array columns;
 *  - concatenates multi-file chunks per datatype and sorts by time
 *    (mat_to_cdf's xr.concat + sortby, :719-755);
 *  - surfaces the `<prefix>_Beam2xyz` transform matrix for the wave-coord
 *    glue (sig/cdf2nc.py:1448-1477).
 */
object Sig {

  /** MATLAB datenum → epoch microseconds (mat2cdf.py:16-19:
    * fromordinal(int(dn)) + days(dn % 1) − days(366)). Python ordinal 1 is
    * 0001-01-01; 1970-01-01 is ordinal 719163. */
  def datenumToMicros(dn: Double): Long = {
    val ord = dn.toLong
    val frac = dn - ord
    val days = ord - 719163L - 366L
    days * 86400000000L + math.round(frac * 86400000000.0)
  }

  final case class Group(dataType: String, df: DataFrame,
                         beam2xyz: Option[Array[Double]])

  /** Output-file type suffix per data_type (mat_to_cdf :758-781). Echo
    * groups keep their transducer number (`Echo2Bin1_450kHz` → echo2);
    * only one of Burst/BurstHR (and Alt_Burst/Alt_BurstHR) exists per
    * deployment — the HighResolution flag picks the variant — so those
    * shared suffixes cannot collide. */
  def ftype(dataType: String): String = dataType match {
    case "Burst" | "BurstHR"           => "burst"
    case "IBurst" | "IBurstHR"         => "iburst"
    case "BurstRawAltimeter"           => "burstrawalt"
    case "Average"                     => "avgd"
    case "Alt_Average"                 => "altavgd"
    case "Alt_Burst" | "Alt_BurstHR"   => "altburst"
    case "Alt_IBurst" | "Alt_IBurstHR" => "altiburst"
    case "Alt_BurstRawAltimeter"       => "altburstrawalt"
    case e if e.startsWith("Alt_Echo") =>
      "altecho" + e.drop("Alt_Echo".length).takeWhile(_.isDigit)
    case e if e.startsWith("Echo") =>
      "echo" + e.drop("Echo".length).takeWhile(_.isDigit)
    case other                         => other.toLowerCase
  }

  /** Config-key prefix for a data prefix: IBurst shares the Burst geometry,
    * echo groups (`Echo1Bin1_450kHz`) use the EchoSounder keys
    * (mat2cdf.py:120-205). */
  private def cfgPrefix(prefix: String): String = {
    val p = prefix.replace("IBurst", "Burst")
    if (p.startsWith("Echo")) "EchoSounder"
    else if (p.startsWith("Alt_Echo")) "Alt_EchoSounder"
    else p
  }

  /** data_type label for a data prefix. Echo groups KEEP their full prefix
    * (`Echo1Bin1_450kHz`) — the reference only handles echo1 "to start"
    * (mat2cdf.py:186), but a file can carry several echo transducers and
    * collapsing them to one label would merge (or clobber) distinct
    * groups. [[ftype]] still maps them onto the reference's echoN file
    * names via the leading digit. */
  private def dataType(prefix: String): String = prefix

  private def num(v: Mat5.MatValue): Option[Array[Double]] = v match {
    case Mat5.MatNum(_, data) => Some(data)
    case _ => None
  }

  /** Split one parsed .mat into per-datatype groups. */
  def split(spark: SparkSession, mat: Map[String, Mat5.MatValue]): Seq[Group] = {
    val data = mat.get("Data") match {
      case Some(Mat5.MatStruct(f)) => f
      case _ => return Nil
    }
    val cfg = mat.get("Config") match {
      case Some(Mat5.MatStruct(f)) => f
      case _ => Map.empty[String, Mat5.MatValue]
    }
    def cfgNum(k: String): Option[Double] = cfg.get(k).flatMap(num).flatMap(_.headOption)

    val prefixes = data.keys.filter(_.endsWith("_Time"))
      .map(_.stripSuffix("_Time")).toSeq.sorted
    prefixes.flatMap { prefix =>
      val times = num(data(prefix + "_Time")).getOrElse(Array.empty)
      if (times.isEmpty) None else {
        val ntime = times.length
        val cp = cfgPrefix(prefix)
        val ncells = cfgNum(cp + "_NCells").map(_.toInt)
        val bindist: Option[Array[Double]] = for {
          nc <- ncells
          cs <- cfgNum(cp + "_CellSize")
          bl <- cfgNum(cp + "_BlankingDistance")
        } yield Array.tabulate(nc)(i => bl + cs / 2 + i * cs)

        // classify the group's variables (MATLAB column-major data)
        val vars = data.collect {
          case (k, Mat5.MatNum(dims, d)) if k.startsWith(prefix + "_") &&
              k != prefix + "_Time" =>
            (k.stripPrefix(prefix + "_"), dims, d)
        }.toSeq.sortBy(_._1)
        val scalars = vars.filter { case (_, dims, d) =>
          d.length == ntime && dims.count(_ > 1) <= 1 }
        val cells = vars.filter { case (_, dims, d) =>
          dims.length == 2 && dims(0) == ntime &&
            ncells.contains(dims(1)) && d.length == ntime * dims(1) }
        val aux = vars.filter { case (n, dims, d) =>
          dims.length == 2 && dims(0) == ntime && dims(1) > 1 &&
            !ncells.contains(dims(1)) && d.length == ntime * dims(1) }

        val base = Seq(StructField("time", TimestampType)) ++
          (if (cells.nonEmpty) Seq(StructField("bin", IntegerType),
            StructField("bindist", DoubleType)) else Nil) ++
          cells.map(c => StructField(c._1, DoubleType)) ++
          scalars.map(s => StructField(s._1, DoubleType)) ++
          aux.map(a => StructField(a._1, ArrayType(DoubleType)))
        val schema = StructType(base)

        def tsOf(i: Int): java.sql.Timestamp = {
          val us = datenumToMicros(times(i))
          val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          ts
        }
        val rows: Seq[Row] =
          if (cells.nonEmpty) {
            val nc = ncells.get
            for (t <- 0 until ntime; c <- 0 until nc) yield Row.fromSeq(
              Seq(tsOf(t), c, bindist.map(_(c)).getOrElse(Double.NaN)) ++
                cells.map { case (_, _, d) => d(c * ntime + t) } ++
                scalars.map(_._3(t)) ++
                aux.map { case (_, dims, d) =>
                  Array.tabulate(dims(1))(j => d(j * ntime + t)).toSeq })
          } else {
            for (t <- 0 until ntime) yield Row.fromSeq(
              Seq(tsOf(t)) ++ scalars.map(_._3(t)) ++
                aux.map { case (_, dims, d) =>
                  Array.tabulate(dims(1))(j => d(j * ntime + t)).toSeq })
          }
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toList, 1), schema)
        val beam2xyz = cfg.get(cp + "_Beam2xyz").flatMap(num)
        Some(Group(dataType(prefix), df, beam2xyz))
      }
    }
  }

  /** Multi-file chunk concat: `basefile_*.mat` sorted by (length, name) —
    * the reference's sorted(key=len) so `_10` follows `_9` — parsed, grouped,
    * unioned per datatype, sorted by time (mat_to_cdf :719-755). */
  def ingest(spark: SparkSession, basefile: String): Seq[Group] = {
    val dir = new java.io.File(basefile).getParentFile
    val name = new java.io.File(basefile).getName
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(name + "_") && f.getName.endsWith(".mat"))
      .sortBy(f => (f.getName.length, f.getName))
    require(files.nonEmpty, s"no ${name}_*.mat chunks in $dir")
    val all = files.flatMap { f =>
      split(spark, Mat5.parse(java.nio.file.Files.readAllBytes(f.toPath)))
    }
    all.groupBy(_.dataType).toSeq.sortBy(_._1).map { case (dt, gs) =>
      val df = gs.map(_.df).reduce(_ unionByName _).orderBy("time")
      Group(dt, df, gs.flatMap(_.beam2xyz).headOption)
    }
  }

  /** Beam→instrument transform using the Config Beam2xyz matrix (row-major
    * n×n on vel columns; the wave-coordinate glue of sig/cdf2nc.py:
    * 1448-1477). Output columns vel_x, vel_y, vel_z(, vel_z2). */
  def applyBeam2xyz(df: DataFrame, m: Array[Double], velCols: Seq[String]): DataFrame = {
    val n = velCols.length
    require(m.length == n * n, s"Beam2xyz ${m.length} != $n x $n")
    val outNames = Seq("vel_x", "vel_y", "vel_z", "vel_z2").take(n)
    outNames.zipWithIndex.foldLeft(df) { case (d, (out, i)) =>
      d.withColumn(out,
        velCols.zipWithIndex.map { case (v, j) =>
          col(v) * lit(m(i * n + j)) }.reduce(_ + _))
    }
  }
}
