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
