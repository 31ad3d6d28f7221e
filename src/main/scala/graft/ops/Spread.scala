package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Parallelism guard for CPU-heavy per-row operators (pair joins, shingle
 * explodes, per-vector math). A small single-file parquet table arrives as
 * ONE input partition, serializing everything downstream; and a bare
 * `repartition(col)` is undone by AQE, which coalesces the tiny shuffle
 * right back to one partition. `repartition(n, col)` carries the
 * REPARTITION_BY_NUM shuffle origin, which AQE must honor.
 *
 * At cluster scale the explicit count equals `defaultParallelism` (total
 * executor cores), so this stays correct on 1000 executors — it only ever
 * widens a degenerate input, never narrows a wide one by much more than the
 * core count.
 */
object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
