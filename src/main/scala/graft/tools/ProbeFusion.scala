package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: piecewise timing of quality_rank_fusion's stages. */
object ProbeFusion {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scratch/sf1")
    val TA = graft.ops.TextAnalysis
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PIECE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("docs-count")(docs.count())
    time("quality-proj")(docs.select(col("doc_id"),
      round(TA.qualityScore(col("text")), 8).as("q")).count())
    time("dupfrac-proj")(docs.select(col("doc_id"),
      round(TA.duplicateNgramFraction(TA.tokens(col("text")), 3), 8).as("r")).count())
    time("lm-cold")(TA.charBigramLmScore(docs, "doc_id", "text").count())
    time("lm-warm")(TA.charBigramLmScore(docs, "doc_id", "text").count())
    val sig = TA.charBigramLmScore(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source"),
        round(TA.qualityScore(col("text")), 8).as("quality"),
        round(TA.duplicateNgramFraction(TA.tokens(col("text")), 3), 8)
          .as("dup_frac")), "doc_id")
    time("sig-join")(sig.count())
    import org.apache.spark.sql.expressions.Window
    val wLm = Window.partitionBy("source").orderBy(col("lm_score").desc, col("doc_id"))
    val wQ = Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    val wR = Window.partitionBy("source").orderBy(col("dup_frac").asc, col("doc_id"))
    val fused = sig
      .withColumn("r_lm", row_number().over(wLm))
      .withColumn("r_q", row_number().over(wQ))
      .withColumn("r_rep", row_number().over(wR))
      .withColumn("rrf", round(
        lit(1.0) / (lit(60.0) + col("r_lm")) +
        lit(1.0) / (lit(60.0) + col("r_q")) +
        lit(1.0) / (lit(60.0) + col("r_rep")), 9))
    time("windows")(fused.count())
    val wF = Window.partitionBy("source").orderBy(col("rrf").desc, col("doc_id"))
    time("rank-nofilter")(fused.withColumn("rank", row_number().over(wF)).count())
    time("full")(fused.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= 50).count())
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    time("full-nogrouplimit")(fused.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= 50).count())
    // count() prunes unused columns (windows/projections eliminate) — force
    // evaluation by hashing every output column
    def forced(df: org.apache.spark.sql.DataFrame): Long =
      df.select(hash(df.columns.map(col): _*).as("h")).agg(sum("h")).count()
    time("F-quality-proj")(forced(docs.select(col("doc_id"),
      round(TA.qualityScore(col("text")), 8).as("q"))))
    time("F-dupfrac-proj")(forced(docs.select(col("doc_id"),
      round(TA.duplicateNgramFraction(TA.tokens(col("text")), 3), 8).as("r"))))
    time("F-lm")(forced(TA.charBigramLmScore(docs, "doc_id", "text")))
    time("F-sig")(forced(sig))
    time("F-windows")(forced(fused))
    time("F-full")(forced(fused.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= 50)))
    time("F-rank4-nofilter")(forced(
      fused.withColumn("rank", row_number().over(wF))))
    val wSimple = Window.partitionBy("source").orderBy(col("doc_id"))
    time("F-simplewin-filter")(forced(
      fused.withColumn("rank", row_number().over(wSimple))
        .filter(col("rank") <= 50)))
    time("F-full-again")(forced(fused.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= 50)))
    val mat = fused.localCheckpoint()
    time("F-full-mat")(forced(mat.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= 50)))
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    time("F-full-nocp")(forced(fused.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= 50)))
    spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    val fq = fused.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= 50)
      .select(hash(fused.columns.map(col) :+ col("rank"): _*).as("h"))
      .agg(sum("h"))
    time("F-planning-only") { fq.queryExecution.executedPlan; 0L }
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages.add(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%5d " +
          f"${(i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3}%7.2f s  ${i.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    time("F-exec-after-plan")(fq.count())
    Thread.sleep(500)
    stages.forEach(s => println(s))
    spark.stop()
  }
}
