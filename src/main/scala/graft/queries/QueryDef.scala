package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One verifiable operator query: a Spark plan over the driver's synthetic
 * tables plus (when SQL-expressible) the equivalent DuckDB oracle SQL.
 * Column names/aliases MUST match between the two — the driver sorts columns
 * by name before hashing values.
 */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    note: String = "")

/** Cross-engine float determinism helpers. Plain double sums/avgs are
  * summation-order-dependent (Spark partial aggs vs DuckDB sequential), so two
  * engines disagree in final ulps. For source columns with fixed decimal scale
  * (the synthetic doubles are 2-decimal), summing as exact DECIMAL and doing a
  * single double division at the end is bit-identical on both engines. */
object Exact {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  def avg(c: Column): Column =
    sum(c.cast("decimal(30,6)")).cast("double") / count(c)
  def avgSql(x: String): String =
    s"CAST(sum(CAST($x AS DECIMAL(30,6))) AS DOUBLE)/count($x)"
}

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts arrives either as parquet TIMESTAMP(NANOS) (older driver data —
    * nanosAsLong reads it as raw long nanoseconds, exact) or as
    * timestamp[us] (current driver data — Spark loads TIMESTAMP/TIMESTAMP_NTZ).
    * Normalize both to BIGINT nanoseconds here, in ONE place, so every
    * downstream `ts div …` and epoch-ns literal works unchanged and the DuckDB
    * oracles keep comparing via `epoch_ns(ts)`. All entry points pin the
    * session timeZone to UTC, so the NTZ→instant cast is the identity. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df // already bigint nanos
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}

/**
 * Engine-exact field canonicalization for the dataset_fingerprint queries.
 * Every field becomes a string that Spark and DuckDB agree on to the byte:
 *  - NULL (any type) -> a chr(2)||"NULL" sentinel via coalesce/CASE on
 *    both sides, so no engine concat/NULL rule is load-bearing;
 *  - integers/strings -> their plain cast (identical text both engines);
 *  - doubles -> floor(v*100 + 0.5) as integer text. `*`, `+` and floor
 *    are IEEE-754-exact, so both engines compute the identical integer —
 *    unlike round() (Spark rounds the shortest decimal repr, DuckDB the
 *    binary value) or double->DECIMAL casts (engine-specific half-way
 *    rules). NaN / +-Inf / |v| >= 9e16 (BIGINT overflow: DuckDB raises
 *    where Spark clamps) get literal sentinels on both sides.
 */
object Fp {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import graft.ops.Sketches.hash60c

  private val NullS = "\u0002NULL"
  private val NullSql = "chr(2) || 'NULL'"

  def canon(c: Column): Column = coalesce(c.cast("string"), lit(NullS))
  def canonSql(x: String): String = s"coalesce(CAST($x AS VARCHAR), $NullSql)"

  /** Double -> engine-exact integer text (see object doc). */
  def canonValue(c: Column): Column =
    when(c.isNull, lit(NullS))
      .when(isnan(c), lit("NaN"))
      .when(c === lit(Double.PositiveInfinity), lit("Inf"))
      .when(c === lit(Double.NegativeInfinity), lit("-Inf"))
      .when(abs(c) >= lit(9e16), lit("BIG"))
      .otherwise(floor(c * lit(100d) + lit(0.5)).cast("string"))
  def canonValueSql(x: String): String =
    s"""CASE WHEN $x IS NULL THEN $NullSql
       |        WHEN isnan($x) THEN 'NaN'
       |        WHEN isinf($x) AND $x > 0 THEN 'Inf'
       |        WHEN isinf($x) THEN '-Inf'
       |        WHEN abs($x) >= 9e16 THEN 'BIG'
       |        ELSE CAST(CAST(floor($x * 100 + 0.5) AS BIGINT) AS VARCHAR) END""".stripMargin

  /** (field label, canonical Column) per table — keep in lockstep with
    * the *Sql twins below (same labels, same order). */
  def docFields: Seq[(String, Column)] = Seq(
    "doc_id" -> canon(col("doc_id")), "text" -> canon(col("text")),
    "lang" -> canon(col("lang")), "source" -> canon(col("source")),
    "n_chars" -> canon(col("n_chars")))
  def eventFields: Seq[(String, Column)] = Seq(
    "event_id" -> canon(col("event_id")),
    "user_id" -> canon(col("user_id")),
    "event_type" -> canon(col("event_type")),
    "ts" -> canon(col("ts")),
    "value" -> canonValue(col("value")))
  def docFieldsSql: Seq[(String, String)] = Seq(
    "doc_id" -> canonSql("doc_id"), "text" -> canonSql("text"),
    "lang" -> canonSql("lang"), "source" -> canonSql("source"),
    "n_chars" -> canonSql("n_chars"))
  def eventFieldsSql: Seq[(String, String)] = Seq(
    "event_id" -> canonSql("event_id"),
    "user_id" -> canonSql("user_id"),
    "event_type" -> canonSql("event_type"),
    "ts" -> canonSql("epoch_ns(ts)"),
    "value" -> canonValueSql("value"))

  /** (table_name, n_rows, fingerprint): commutative DECIMAL sum of 60-bit
    * row hashes — one map-side-combinable aggregation, order/partitioning
    * free. */
  def tableFp(df: DataFrame, name: String,
              fields: Seq[(String, Column)]): DataFrame = {
    val rowStr = concat(fields.map(_._2)
      .flatMap(c => Seq(lit("\u0001"), c)).drop(1): _*)
    // spread the scan before hashing: the md5-per-row partial aggregation
    // otherwise collapses into the one-split scan stage of a small file
    // and runs single-task (r17 measurement); the hash sum is commutative,
    // so a keyed repartition cannot change the result
    graft.ops.Spread.byKey(df, fields.head._2)
      .select(rowStr.as("__r"))
      .agg(lit(name).as("table_name"), count(lit(1)).as("n_rows"),
        modFp(sum(hash60c(col("__r")).cast("decimal(38,0)")))
          .as("fingerprint"))
  }

  /** The commutative DECIMAL(38,0) hash sum exceeds int64 at sf0.01+
    * (observed 2^68..2^76) — exactly the range where downstream readers
    * disagree on DECIMAL handling. Reduce mod 2^60 while still in exact
    * DECIMAL arithmetic, then cast to BIGINT (lossless: result < 2^60).
    * Collision resistance is unchanged for a fingerprint: the row hashes
    * are 60-bit to begin with. Both engines must apply the identical
    * reduction — use modFpSql for the oracle side. */
  val FpMod = 1152921504606846976L // 2^60
  private def modFp(sumCol: Column): Column =
    (sumCol % lit(java.math.BigDecimal.valueOf(FpMod))).cast("long")
  def modFpSql(sumSql: String): String =
    s"CAST($sumSql % CAST($FpMod AS DECIMAL(38,0)) AS BIGINT)"

  /** One row per field: (table_name, field_name, n_rows, fingerprint) —
    * single aggregation pass per table, then a stack unpivot (no
    * re-aggregation per field). */
  def fieldFp(df: DataFrame, table: String,
              fields: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: fields.map { case (n, c) =>
      modFp(sum(hash60c(c).cast("decimal(38,0)"))).as(s"fp_$n") }
    // spread for the same reason as [[tableFp]]: fields.size md5s per row
    // otherwise run single-task inside the one-split scan
    graft.ops.Spread.byKey(df, fields.head._2)
      .agg(aggs.head, aggs.tail: _*).selectExpr(
      s"'$table' AS table_name",
      "n_rows",
      s"stack(${fields.size}, " + fields.map { case (n, _) =>
        s"'$n', fp_$n" }.mkString(", ") + ") AS (field_name, fingerprint)")
  }
}
