package graft.tools
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      // time construction too: iterative operators (connected components,
      // k-means) run driver-side loops eagerly while building the plan
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val n = df.count()
      println(f"TIMING $name ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
      if (sys.env.contains("EXPLAIN")) df.explain("formatted")
      // release shared() intermediates like Bench does — without this,
      // every profiled query's pinned caches accumulate for the session
      // and later timings absorb the eviction/GC pressure (measured:
      // dedup_jaccard_prefix 15 s cold but 39 s "warm" under the pile-up)
      graft.ops.Spread.release(spark)
      // match Bench's cold-cost basis (r18)
      graft.ops.BoundedMemo.clearAll()
    }
    spark.stop()
  }
}
