package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Snapshot reconciliation — the added/removed/changed/unchanged diff
 * report between two keyed snapshots of the same table (pipeline-version
 * validation, CDC backfill checks, migration sign-off). The relational
 * complement to the SCD2 changelog operators: those track history as it
 * accumulates, this compares two complete states after the fact.
 *
 * One full-outer shuffle join on the key columns (the canonical
 * reconciliation shape — AQE splits skewed keys); row equality via a
 * null-safe fingerprint of the compare columns (explicit null marker +
 * a 0x01 separator, so ("a", null) never collides with (null, "a")).
 * The report aggregation is map-side combinable.
 */
object Reconcile {

  /** Null-safe row fingerprint over the compare columns. */
  private def rowSig(cols: Seq[String], side: DataFrame): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(side(c).cast("string"), lit("\u0000"))): _*))

  /**
   * Diff report: one row per class — added (key only in `b`), removed
   * (key only in `a`), changed (both sides, fingerprints differ),
   * unchanged — with row counts and the min/max key per class (the
   * deterministic "show me an example" anchor every reconciliation
   * report needs).
   *
   * Output: (diff_class, n_rows, min_key, max_key).
   */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    val la = a.select(col(keyCol).cast("long").as("__ka"),
      rowSig(compareCols, a).as("__sa"))
    val lb = b.select(col(keyCol).cast("long").as("__kb"),
      rowSig(compareCols, b).as("__sb"))
    la.join(lb, col("__ka") === col("__kb"), "full_outer")
      .select(
        when(col("__ka").isNull, lit("added"))
          .when(col("__kb").isNull, lit("removed"))
          .when(col("__sa") =!= col("__sb"), lit("changed"))
          .otherwise(lit("unchanged")).as("diff_class"),
        coalesce(col("__ka"), col("__kb")).as("__k"))
      .groupBy("diff_class")
      .agg(count(lit(1)).as("n_rows"),
        min("__k").as("min_key"), max("__k").as("max_key"))
  }
}
