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
}
