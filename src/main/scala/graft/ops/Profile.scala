package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-column table profiling — the data-quality report (deequ/TFDV
 * shape) a pipeline runs before training: row count, null count,
 * distinct cardinality (exact + the mergeable HLL estimate from
 * [[Sketches]] — at 100 TB only the registers are affordable, and the
 * estimate rides next to the exact count so its error is visible), and
 * lexicographic min/max as the "show me the range" anchor.
 *
 * One `stack` unpivot (codegen projection, no shuffle) feeds one
 * aggregation keyed by column name plus the HLL register build — column
 * count × m register rows of state, independent of table size. Callers
 * must pass columns whose STRING form is engine-stable (integers and
 * strings; floats need a caller-chosen fixed-point projection first —
 * engines disagree on float formatting).
 */
object Profile {

  /** Output: (col_name, n_rows, n_null, n_distinct, distinct_est,
    * min_val, max_val); all-null columns profile with n_distinct = 0. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
    val long = Spread.shared(df.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (col_name, val)"))
    val base = long.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col("val"))).as("n_null"),
      min("val").as("min_val"), max("val").as("max_val"))
    val hll = Sketches.hllDistinct(long.filter(col("val").isNotNull),
        "col_name", "val")
      .select(col("col_name"), col("n_true").as("n_distinct"),
        col("est").as("distinct_est"))
    base.join(hll, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("distinct_est"), lit(0.0)).as("distinct_est"),
        col("min_val"), col("max_val"))
  }

  /**
   * Join-key skew profile — the diagnostic you run BEFORE choosing a
   * shuffle strategy: per-key frequency percentiles, the heaviest key's
   * share, and the implied salt factor (⌈max_freq / mean_freq⌉ — how many
   * ways the hottest key must split before its partition looks average).
   * This is the measurement side of [[Spread.saltedJoin]].
   *
   * Two aggregations: key → frequency, then frequency → key-count — the
   * second table is bounded by the number of DISTINCT frequency values,
   * so the percentile window never spans data-sized rows. All integer
   * arithmetic (percentiles are lower-quantiles, share in millionths,
   * ceil-div salt), bit-identical cross-engine.
   *
   * Output: one row — (key_name, n_rows, n_keys, max_freq, p50_freq,
   * p99_freq, top1_millionths, salt_factor).
   */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val freq = df.groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val hist = freq.groupBy("__c").agg(count(lit(1)).as("__nk"))
    // the frequency-of-frequencies table is bounded (distinct frequency
    // values), so the cumulative scan is a per-row FOLD over one collected
    // sorted array — no window at all, not even a bounded one
    hist
      .agg(
        sort_array(collect_list(struct(col("__c"), col("__nk")))).as("__h"),
        sum(col("__c") * col("__nk")).as("n_rows"),
        sum("__nk").as("n_keys"),
        max("__c").as("max_freq"))
      .withColumn("__fold", expr(
        """aggregate(__h,
          |  struct(CAST(0 AS BIGINT) AS cum, CAST(NULL AS BIGINT) AS p50,
          |         CAST(NULL AS BIGINT) AS p99),
          |  (a, x) -> struct(
          |    a.cum + x.__nk,
          |    CASE WHEN a.p50 IS NULL AND 2 * (a.cum + x.__nk) >= n_keys
          |      THEN x.__c ELSE a.p50 END,
          |    CASE WHEN a.p99 IS NULL AND 100 * (a.cum + x.__nk) >= 99 * n_keys
          |      THEN x.__c ELSE a.p99 END))""".stripMargin))
      .select(lit(keyCol).as("key_name"), col("n_rows"), col("n_keys"),
        col("max_freq"),
        col("__fold.p50").as("p50_freq"), col("__fold.p99").as("p99_freq"),
        expr("max_freq * 1000000 div n_rows").as("top1_millionths"),
        expr("(max_freq * n_keys + n_rows - 1) div n_rows").as("salt_factor"))
  }
}
