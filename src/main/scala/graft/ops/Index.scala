package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scalable global positional index (SURVEY §7.5 risk 3 + the clip_good_ens /
 * trim_bad_ens_index follow-up): the reference's whole-series integer index
 * semantics (np.arange over the series) without a single-partition window.
 *
 * Two-pass design: range-repartition on the order key so partitions are
 * globally sorted → count rows per partition (tiny driver-side array) →
 * mapPartitions adds the partition's cumulative offset to a local index.
 * Shuffle cost is one range exchange; no partition ever holds the series.
 */
object Index {

  /** Append a 0-based global position column in (orderCols) order.
    * orderCols must form a total order (include a unique key).
    * The ranged RDD is persisted so the counts pass and the data pass share
    * one shuffle + sort instead of recomputing it. */
  def withGlobalPosition(df: DataFrame, orderCols: Seq[String],
                         posCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val rdd = ranged.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().sortBy(_._1).map(_._2.toLong)
    val offsets = counts.scanLeft(0L)(_ + _)
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+
        org.apache.spark.sql.types.StructField(posCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var pos = offsets(i)
      it.map { r =>
        val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pos)
        pos += 1
        out
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Append a running total (inclusive prefix sum) of an integral column in
    * (orderCols) order — the scale-safe form of
    * `sum(v).over(Window.orderBy(...))`, whose empty partitioning serializes
    * the table through one task. Same two-pass shape as
    * [[withGlobalPosition]]: per-partition sums are a tiny driver array;
    * each partition then streams once adding its offset. */
  def withRunningTotal(df: DataFrame, orderCols: Seq[String], valueCol: String,
                       outCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val vIdx = ranged.schema.fieldIndex(valueCol)
    val rdd = ranged.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.get(vIdx).asInstanceOf[Number].longValue())
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        acc += r.get(vIdx).asInstanceOf[Number].longValue()
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
