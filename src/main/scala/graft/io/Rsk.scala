package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * RBR `.rsk` (SQLite) deployment reader — the native-format twin of the CSV
 * export path (stglib/rsk/rsk2cdf.py). `data`/`burstdata` hold
 * (tstamp [ms epoch], channelNN) series; `schedules`/`wave`/`continuous`
 * carry the sampling-rate metadata the reference folds into dataset attrs
 * (stglib/core/utils.py:1417-1491).
 *
 * Distribution: one `.rsk` = one deployment file; many files parallelize
 * via spark.read.format("binaryFile") with one decode task per file (same
 * shape as Pd0/Son81R). A single file's decode is driver-free: the byte
 * array is parsed inside the executor task.
 */
object Rsk {

  /** Schema inferred per column: SQLite is dynamically typed AND stores
    * losslessly-integral REALs as INTEGER on disk, so a REAL column can mix
    * serial types — any Double observed promotes the column to DoubleType. */
  private def inferSchema(cols: Seq[String], rows: Seq[Seq[Any]]): StructType =
    StructType(cols.zipWithIndex.map { case (c, i) =>
      val vals = rows.iterator.map(_(i)).filter(_ != null)
      var dt: DataType = null
      vals.foreach {
        case _: java.lang.Double => if (dt != StringType) dt = DoubleType
        case _: java.lang.Long => if (dt == null) dt = LongType
        case _: String =>
          if (dt == null || dt == LongType) dt = StringType // mixed → text
        case _: Array[Byte] => if (dt == null) dt = BinaryType
        case _ => ()
      }
      StructField(c, if (dt == null) StringType else dt, nullable = true)
    })

  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (x: java.lang.Long, DoubleType) => x.toDouble
    case (x: java.lang.Long, StringType) => x.toString
    case (x: java.lang.Double, StringType) => x.toString
    case (x, _) => x
  }

  /** One table of a `.rsk` byte image as a DataFrame. */
  def readTable(spark: SparkSession, bytes: Array[Byte], table: String): DataFrame = {
    val db = Sqlite.open(bytes)
    val info = db.tables.getOrElse(table.toLowerCase,
      throw new NoSuchElementException(
        s"table $table not in ${db.tables.keys.mkString(", ")}"))
    // old records may be SHORTER than the schema (ALTER TABLE ADD COLUMN
    // leaves existing rows with fewer serial types) — pad with nulls BEFORE
    // type inference indexes every column
    val rows = Sqlite.scanTable(db, info.rootPage, info.rowidAlias)
      .map(_.take(info.columns.length).padTo(info.columns.length, null: Any))
    val schema = inferSchema(info.columns, rows)
    val data = rows.map(r => Row.fromSeq(r.zip(schema.fields)
      .map { case (v, f) => coerce(v, f.dataType) }))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data,
        math.max(1, spark.sparkContext.defaultParallelism)), schema)
  }

  /** The measurement series: `data`, falling back to `burstdata`
    * (rsk2cdf.py:193-276 tries both, incl. the capital-D variant). */
  def readSeries(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val db = Sqlite.open(bytes)
    val name = Seq("data", "burstdata").find(db.tables.contains)
      .getOrElse(throw new NoSuchElementException("no data/burstdata table"))
    readTable(spark, bytes, name)
  }

  /** Sampling metadata attrs (stglib/core/utils.py:1417-1491): one map of
    * `<table>_<column> -> value` over schedules/wave/continuous. */
  def samplingAttrs(bytes: Array[Byte]): Map[String, Any] = {
    val db = Sqlite.open(bytes)
    Seq("schedules", "wave", "continuous").flatMap { t =>
      db.tables.get(t).toSeq.flatMap { info =>
        Sqlite.scanTable(db, info.rootPage).headOption.toSeq.flatMap { row =>
          info.columns.zip(row).map { case (c, v) => s"${t}_$c" -> v }
        }
      }
    }.toMap
  }
}
