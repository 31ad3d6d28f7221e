package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Inline data-quality counters via `Dataset.observe` — metrics computed
 * AS THE DATA FLOWS PAST (accumulator-backed, no second scan, no extra
 * shuffle): the ingestion-guardrail shape ("rows read, nulls seen, id
 * range" alongside every load) that a separate profiling query would pay
 * a full pass for. Batch queries surface them through a
 * QueryExecutionListener; streams report them per micro-batch in
 * `StreamingQueryProgress.observedMetrics` — same plan, both modes
 * (ObserveSpec proves the counters equal a direct aggregation).
 */
object Observe {

  /** Attach standard quality counters for `cols` under metric `name`:
    * n_rows plus per-column null counts (`<col>_nulls`) and min/max
    * (`<col>_min`/`<col>_max`). */
  def withQualityMetrics(df: DataFrame, name: String,
                         cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
      cols.flatMap { c =>
        Seq(sum(col(c).isNull.cast("long")).as(s"${c}_nulls"),
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
      }
    df.observe(name, aggs.head, aggs.tail: _*)
  }
}
