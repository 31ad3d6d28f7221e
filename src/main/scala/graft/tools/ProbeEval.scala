package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Dev probe: time the sub-stages of the two bounded eval queries. */
object ProbeEval {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%6.2f s  $n rows")
    }
    spark.read.parquet(s"$dir/documents.parquet").groupBy("source").count().count() // warmup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 === 0 && col("doc_id") < 5000)
    t("lsh_pairs")(Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 2, 0.7).count())
    graft.ops.Spread.release(spark)
    t("lsh_pairs2")(Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 2, 0.7).count())
    graft.ops.Spread.release(spark)
    t("lsh_quality_q")(graft.SparkEntry.queries("lsh_quality")(spark, dir).count())
    graft.ops.Spread.release(spark)
    t("ann_recall_q")(graft.SparkEntry.queries("ann_recall")(spark, dir).count())
    graft.ops.Spread.release(spark)
    t("truth_pairs")(Dedup.ngramJaccardPairs(docs.withColumn("__all", lit(1)),
      "doc_id", "text", "__all", 3, 0.7).count())
    graft.ops.Spread.release(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val slice = col("vec_id") % 4 === 0 && col("vec_id") < 2000
    t("brute_truth")(Similarity.bruteTopK(emb, "vec_id", "embedding", 3)
      .filter(slice).count())
    graft.ops.Spread.release(spark)
    t("pq_rerank")(Similarity.pqRerank(emb, "vec_id", "embedding",
      64, 4, 16, 2, 8, 3, 10, 3).filter(slice).count())
    graft.ops.Spread.release(spark)
    t("pq_rerank_warm")(Similarity.pqRerank(emb, "vec_id", "embedding",
      64, 4, 16, 2, 8, 3, 10, 3).filter(slice).count())
    spark.stop()
  }
}
