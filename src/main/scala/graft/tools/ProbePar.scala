package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-partition timing of the diwasp perGroup stage (dev tool). */
object ProbePar {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val events = spark.read.parquet(s"$dir/events.parquet")
    events.count()
    val f0 = 0.125
    val ph = col("sample") * lit(2.0 * math.Pi * f0)
    val puv = graft.ops.Index.withGlobalPosition(events, Seq("ts", "event_id"), "rn")
      .withColumn("burst", (col("rn") / 512).cast("long"))
      .withColumn("sample", col("rn") % 512)
      .withColumn("nb", count(lit(1)).over(Window.partitionBy("burst")))
      .filter(col("nb") === 512)
      .withColumn("p", lit(0.3) * cos(ph) + (col("value") * 7919.0 % 97.0) / 5000.0)
      .withColumn("u", lit(0.2) * cos(ph) + (col("value") * 104729.0 % 89.0) / 5000.0)
      .withColumn("v", lit(0.1) * cos(ph) + (col("value") * 15485863.0 % 83.0) / 5000.0)
    val ds = puv.select(col("burst").cast("long").as("_1"),
        col("sample").cast("long").as("_2"),
        col("p").cast("double").as("_3"), col("u").cast("double").as("_4"),
        col("v").cast("double").as("_5"))
      .as[(Long, Long, Double, Double, Double)]
    val n = spark.sparkContext.defaultParallelism
    println(s"[probe] defaultParallelism = $n")
    val stats = ds.repartition(n, col("_1")).sortWithinPartitions("_1", "_2")
      .mapPartitions { it =>
        val t0 = System.nanoTime()
        val rows = it.toArray
        val keys = rows.map(_._1).distinct
        keys.foreach { k =>
          val burst = rows.filter(_._1 == k)
          graft.kernels.Diwasp.dirspec(
            Array(burst.map(_._3), burst.map(_._4), burst.map(_._5)),
            Array("pres", "velx", "vely"),
            Array(Array(0.0, 0.0, 0.0), Array(0.0, 0.0, 0.0), Array(0.5, 1.0, 1.0)),
            10.0, 1.0, 256, 90, "IMLM", 50, 0.05, 0.45)
        }
        Iterator.single((org.apache.spark.TaskContext.getPartitionId(),
          keys.length, (System.nanoTime() - t0) / 1e6))
      }.collect()
    stats.sortBy(_._1).foreach { case (pid, nk, ms) =>
      println(f"[probe] pid=$pid%2d bursts=$nk%3d  $ms%8.1f ms")
    }
    println(f"[probe] total kernel ms = ${stats.map(_._3).sum}%.0f, max task = ${stats.map(_._3).max}%.0f")
    spark.stop()
  }
}
