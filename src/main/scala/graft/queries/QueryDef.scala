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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by default;
    * nanosAsLong reads it as raw long nanoseconds (exact — no truncation).
    * Oracles compare via DuckDB `epoch_ns(ts)`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
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
