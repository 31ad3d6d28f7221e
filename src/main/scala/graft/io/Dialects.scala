package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dedicated CSV dialects beyond the generic framework reader: Marotte
 * (stglib/mar.py:12-39), Geolux/Campbell TOA5 (stglib/glx.py:12-65,
 * stglib/met.py:30-47), Lowell TCM (stglib/tcm.py:13-50), Mayfly
 * (stglib/met.py:9-27), WET Labs ECO NTU/PAR (stglib/eco.py:8-97),
 * SBE 37 MicroCAT .asc (stglib/mc.py:7-57), Aqua TROLL
 * (stglib/troll.py:118-152), TruBlue 255 (stglib/tb.py:9-103).
 * Text-in APIs like the other instrument readers; multi-file deployments
 * parallelize via binaryFile with one decode task per file (the
 * reference's glob-concat becomes Spark's native multi-file scan).
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

  final case class TcmRow(time: String, speed: Double, bearing: Double,
                          vel_n: Double, vel_e: Double)

  /** Lowell TCM _CR.txt: one header row, (DateTime, Speed, Bearing,
    * Velocity-N, Velocity-E). */
  def readTcm(spark: SparkSession, text: String, skipRows: Int = 1): DataFrame = {
    import spark.implicits._
    val rows = text.linesIterator.drop(skipRows).filter(_.trim.nonEmpty).map { l =>
      val c = l.split(",").map(_.trim)
      TcmRow(c(0), c(1).toDouble, c(2).toDouble, c(3).toDouble, c(4).toDouble)
    }.toSeq
    spark.createDataset(rows).toDF()
      .withColumn("time", to_timestamp(col("time")))
  }

  /** EnviroDIY Mayfly: 7 preamble rows, header row, -9999 = missing. */
  def readMayfly(spark: SparkSession, text: String, skipRows: Int = 7): DataFrame = {
    import spark.implicits._
    val lines = text.linesIterator.drop(skipRows).toSeq
    val names = lines.head.split(",").map(_.trim).toSeq
    val data = lines.tail.filter(_.trim.nonEmpty)
      .map(_.split(",").map(_.trim).toSeq.padTo(names.length, ""))
    val df = spark.createDataset(data).toDF("r")
      .select(names.zipWithIndex.map { case (n, i) => col("r")(i).as(n) }: _*)
    val typed = names.foldLeft(df) { (d, n) =>
      if (n == "Date and Time in UTC") d
      else d.withColumn(n,
        when(col(n) === "-9999", lit(null)).otherwise(col(n)).cast("double"))
    }
    typed.withColumn("time", to_timestamp(col("Date and Time in UTC")))
      .drop("Date and Time in UTC")
  }

  /** Campbell Scientific met logger .dat — same TOA5 envelope as Geolux;
    * "NAN" missing values become null via the failed double cast
    * (met.py:30-47). */
  def readCampbell(spark: SparkSession, text: String): DataFrame =
    readGeolux(spark, text)

  final case class EcoRow(time: String, counts: Double)

  /** WET Labs ECO NTU/PAR tab-separated log: (date, time, [a,] counts
    * [, b]); countsIdx selects the counts column (PAR=2, NTU=3). */
  def readEco(spark: SparkSession, text: String, countsIdx: Int): DataFrame = {
    import spark.implicits._
    val rows = text.linesIterator.filter(_.trim.nonEmpty).flatMap { l =>
      val c = l.trim.split("\t").map(_.trim)
      if (c.length <= countsIdx) None
      else scala.util.Try(EcoRow(c(0) + " " + c(1), c(countsIdx).toDouble)).toOption
    }.toSeq
    spark.createDataset(rows).toDF()
      .withColumn("time", to_timestamp(col("time"), "MM/dd/yy HH:mm:ss"))
  }

  final case class McRow(time: String, temp: Double, cond: Double, sal: Double)

  /** SBE 37 MicroCAT .asc: *-prefixed header block, then
    * (Temp, Cond, Sal, Date, Time) rows. */
  def readMicrocat(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val rows = text.linesIterator
      .filterNot(l => l.startsWith("*") || l.trim.isEmpty)
      .flatMap { l =>
        val c = l.split(",").map(_.trim)
        if (c.length < 5) None
        else scala.util.Try(McRow(c(3) + " " + c(4),
          c(0).toDouble, c(1).toDouble, c(2).toDouble)).toOption
      }.toSeq
    spark.createDataset(rows).toDF()
      .withColumn("time", to_timestamp(col("time"), "dd MMM yyyy HH:mm:ss"))
  }

  /** MicroCAT .asc header scrape (mc.py:39-57). */
  def microcatHeader(text: String): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    text.linesIterator.takeWhile(_.contains("*")).foreach { line =>
      val col = line.trim.split("\\s+")
      if (line.contains("SERIAL NO.")) {
        m("serial_number") = col(6); m("instrument_type") = col(1)
      } else if (line.contains("sample interval")) m("sample_interval") = col(4)
    }
    m.toMap
  }

  /** Aqua TROLL exported csv: skiprows preamble, header row with unit
    * suffixes, first column is the timestamp (troll.py:118-152). */
  def readAquatroll(spark: SparkSession, text: String, skipRows: Int = 69): DataFrame = {
    import spark.implicits._
    val renames = Map(
      "Temperature (C)" -> "temperature",
      "Actual Conductivity (µS/cm)" -> "conductivity",
      "Pressure (kPa)" -> "pressure", "Pressure (PSI)" -> "pressure",
      "Date and Time (UTC)" -> "time", "Date and Time" -> "time")
    val lines = text.linesIterator.drop(skipRows).toSeq
    val names0 = lines.head.split(",").map(_.trim).toSeq
    val names = names0.map(n => renames.getOrElse(n, n))
    val data = lines.tail.filter(_.trim.nonEmpty)
      .map(_.split(",").map(_.trim).toSeq.padTo(names.length, ""))
    val df = spark.createDataset(data).toDF("r")
      .select(names.zipWithIndex.map { case (n, i) => col("r")(i).as(n) }: _*)
    names.foldLeft(df) { (d, n) =>
      if (n == "time") d.withColumn("time", to_timestamp(col("time")))
      else d.withColumn(n, col(n).cast("double"))
    }
  }

  final case class TbRow(time: String, elapsed: Double, p_1: Double, t_28: Double)

  /** TruBlue 255 csv: keyword header block to "ID,Name,Address", then
    * (ID, Name, Address, time, Elapsed, P_1, T_28) rows (tb.py:9-103). */
  def readTruBlue(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val rows = text.linesIterator
      .dropWhile(l => !l.contains("ID,Name,Address")).drop(1)
      .filter(_.trim.nonEmpty)
      .flatMap { l =>
        val c = l.split(",").map(_.trim)
        if (c.length < 7) None
        else scala.util.Try(TbRow(c(3), c(4).toDouble, c(5).toDouble,
          c(6).toDouble)).toOption
      }.toSeq
    spark.createDataset(rows).toDF()
      .withColumn("time", to_timestamp(col("time")))
      .withColumnRenamed("p_1", "P_1").withColumnRenamed("t_28", "T_28")
  }

  /** TruBlue header scrape (tb.py:9-47). */
  def truBlueHeader(text: String): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    text.linesIterator.takeWhile(l => !l.contains("ID,Name,Address")).foreach { line =>
      val col = line.trim.split("\\s+")
      if (line.contains("Transducer Model")) m("TransducerModel") = col(3)
      else if (line.contains("Transducer Serial")) m("serial_number") = col(3)
      else if (line.contains("Scan Type")) m("ScanType") = col(2)
      else if (line.contains("Firmware Version")) m("FirmwareVersion") = col(2)
    }
    m.toMap
  }

  /** SonTek Argonaut .dat: whitespace columns with a header row; the first
    * six (Year Month Day Hour Minute Second) assemble into `time`, the rest
    * keep their header names as doubles (stglib/argonaut.py:15-27). */
  def readArgonautDat(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val lines = text.linesIterator.filter(_.trim.nonEmpty).toSeq
    require(lines.length >= 2, "argonaut .dat too short")
    val names = lines.head.trim.split("\\s+").toSeq
    require(names.take(6) == Seq("Year", "Month", "Day", "Hour", "Minute", "Second"),
      s"unexpected argonaut header: ${names.take(6)}")
    val rows = lines.drop(1).map { l =>
      val c = l.trim.split("\\s+")
      val ts = f"${c(0).toInt}%04d-${c(1).toInt}%02d-${c(2).toInt}%02d " +
        f"${c(3).toInt}%02d:${c(4).toInt}%02d:${c(5).toInt}%02d"
      (ts, c.drop(6).map(_.toDouble).toSeq)
    }
    val df = spark.createDataset(rows).toDF("ts", "vals")
    val dataNames = names.drop(6)
    df.select((col("ts") +: dataNames.zipWithIndex.map { case (n, i) =>
        col("vals")(i).as(n) }): _*)
      .withColumn("time", to_timestamp(col("ts"))).drop("ts")
  }

  /** One Argonaut two-header-row table (.vel/.snr/.std share the shape,
    * stglib/argonaut.py:44-131): row 1 carries the per-cell group labels
    * (Cell01 Cell01 …), row 2 the field names (Vx Vy Spd Dir / SNR1 SNR2 /
    * Errx Erry); combined names are group_field exactly like the
    * reference's `"_".join` over the pandas MultiIndex. Columns 1–6 are
    * Y/M/D/H/M/S (the reference's parse_dates=[[1,2,3,4,5,6]] is
    * positional). Returns the combined header names plus the rows as
    * (timestamp string, combined name → value). */
  private def argonautTable(
      text: String): (Seq[String], Seq[(String, Map[String, Double])]) = {
    val lines = text.linesIterator.filter(_.trim.nonEmpty).toSeq
    require(lines.length >= 3, "argonaut profile table too short")
    val g = lines(0).trim.split("\\s+")
    val f = lines(1).trim.split("\\s+")
    require(g.length == f.length,
      s"argonaut header rows disagree: ${g.length} vs ${f.length} columns")
    val names = g.zip(f).map { case (a, b) => s"${a}_$b" }.toSeq
    (names, lines.drop(2).map { l =>
      val c = l.trim.split("\\s+")
      val ts = f"${c(1).toInt}%04d-${c(2).toInt}%02d-${c(3).toInt}%02d " +
        f"${c(4).toInt}%02d:${c(5).toInt}%02d:${c(6).toInt}%02d"
      ts -> (7 until math.min(c.length, names.length))
        .map(i => names(i) -> c(i).toDouble).toMap
    })
  }

  /** SonTek Argonaut profile deployment (stglib/argonaut.py:44-131
    * read_vel_snr_std): the .vel/.snr/.std tables long-formatted to one
    * row per (time, bin) with bindist = BlankDistance + bin·CellSize +
    * CellSize/2 from the .ctl ("per Argonaut manual, blanking distance is
    * distance to start of first cell"), plus the .dat `Level` series
    * joined per time. Column names follow the reference's lower-cased
    * vars (vx/vy/spd/dir/snr1/snr2/errx/erry/level). */
  def readArgonautProfile(spark: SparkSession, velText: String,
                          snrText: String, stdText: String, ctlText: String,
                          datText: Option[String]): DataFrame = {
    var blank = Double.NaN; var cs = Double.NaN
    ctlText.linesIterator.foreach { row =>
      val last = row.trim.split("\\s+").lastOption
      if (row.contains("BlankDistance"))
        last.foreach(v => blank = v.toDouble)
      else if (row.contains("CellSize"))
        last.foreach(v => cs = v.toDouble)
    }
    require(!blank.isNaN && !cs.isNaN,
      "argonaut .ctl missing BlankDistance/CellSize")
    val (velNames, vel) = argonautTable(velText)
    val snr = argonautTable(snrText)._2.toMap
    val std = argonautTable(stdText)._2.toMap
    // numbins from the HEADER names (the reference derives it from the
    // variable names, argonaut.py:63-66) — never from the first data
    // row, whose ragged trailing cells would undercount bins for the
    // whole deployment
    val numbins = velNames.count(_.endsWith("_Vy"))
    require(numbins > 0, "argonaut .vel has no Cell*_Vy columns")
    val rows = for ((ts, m) <- vel; k <- 0 until numbins) yield {
      val cell = f"Cell${k + 1}%02d"
      def at(src: Map[String, Double], fld: String): Any =
        src.get(s"${cell}_$fld").map(Double.box).orNull
      org.apache.spark.sql.Row(ts, k,
        blank + k * cs + cs / 2.0,
        at(m, "Vx"), at(m, "Vy"), at(m, "Spd"), at(m, "Dir"),
        at(snr.getOrElse(ts, Map.empty), "SNR1"),
        at(snr.getOrElse(ts, Map.empty), "SNR2"),
        at(std.getOrElse(ts, Map.empty), "Errx"),
        at(std.getOrElse(ts, Map.empty), "Erry"))
    }
    import org.apache.spark.sql.types._
    val schema = StructType(
      StructField("ts", StringType) +: StructField("bin", IntegerType) +:
        Seq("bindist", "vx", "vy", "spd", "dir", "snr1", "snr2",
          "errx", "erry").map(n => StructField(n, DoubleType)))
    var df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), schema)
      .withColumn("time", to_timestamp(col("ts"))).drop("ts")
    datText.foreach { t =>
      val level = readArgonautDat(spark, t)
      if (level.columns.contains("Level"))
        df = df.join(broadcast(level.select(col("time").as("__lt"),
            col("Level").as("level"))),
          df("time") === col("__lt"), "left").drop("__lt")
    }
    df
  }

  /** AreaComp station area/stage export: 4 preamble lines then a CSV with
    * header (stglib/indexvel.py:7-16) — the stage-area rating input of the
    * index-velocity workflow. */
  def readAreacomp(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val lines = text.linesIterator.toSeq.drop(4).filter(_.trim.nonEmpty)
    require(lines.nonEmpty, "areacomp file too short")
    val names = lines.head.split(",").map(_.trim).toSeq
    val rows = lines.drop(1).map(_.split(",").map(_.trim).toSeq
      .padTo(names.length, ""))
    spark.createDataset(rows).toDF("r")
      .select(names.zipWithIndex.map { case (n, i) =>
        col("r")(i).cast("double").as(n) }: _*)
  }
}
