package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the REGISTERED quality_rank_fusion exactly as Bench
  * invokes it (fresh fn call, forced full-column evaluation, Spread
  * release between runs), with stage-level attribution. */
object ProbeQrf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val dur = (i.completionTime.getOrElse(0L) -
            i.submissionTime.getOrElse(0L)) / 1e3
          if (dur > 0.1)
            stages.add(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%5d " +
              f"$dur%7.2f s  ${i.name.take(50)}")
        }
      })
    def once(tag: String): Unit = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("quality_rank_fusion")(spark, dir)
      val n = df.select(hash(df.columns.map(col): _*).as("h"))
        .agg(sum("h")).count()
      println(f"QRF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      graft.ops.Spread.release(spark)
    }
    once("run1")
    once("run2")
    stages.clear() // keep only run3's stages
    once("run3")
    Thread.sleep(500)
    stages.forEach(println)
    println(graft.SparkEntry.queries("quality_rank_fusion")(spark, dir)
      .queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
