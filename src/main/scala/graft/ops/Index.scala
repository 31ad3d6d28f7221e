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
    * orderCols must form a total order (include a unique key). */
  def withGlobalPosition(df: DataFrame, orderCols: Seq[String],
                         posCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val counts = ranged.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+
        org.apache.spark.sql.types.StructField(posCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    val rows = ranged.rdd.mapPartitionsWithIndex { (i, it) =>
      var pos = offsets(i)
      it.map { r =>
        val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pos)
        pos += 1
        out
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
