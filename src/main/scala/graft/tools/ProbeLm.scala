package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: stage-level timing of the char-bigram LM pipeline. */
object ProbeLm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scratch/sf1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
          if (ms > 300)
            stages.add(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%5d " +
              f"${ms / 1e3}%7.2f s")
        }
      })
    val t0 = System.nanoTime()
    val lm = graft.ops.TextAnalysis.charBigramLmScore(docs, "doc_id", "text")
    println(f"CONSTRUCT ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    lm.count()
    println(f"ACTION ${(System.nanoTime() - t1) / 1e9}%.2f s")
    Thread.sleep(500)
    stages.forEach(s => println(s))
    spark.stop()
  }
}
