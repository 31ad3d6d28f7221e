package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does mmr_select's time go — candidate gen, pair
  * sims, or the greedy-loop materializations? */
object ProbeMmr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pred = col("vec_id") % 97 === 0 && col("vec_id") < 9700
    t("bruteTopKFor") {
      graft.ops.Similarity.bruteTopKFor(e, "vec_id", "embedding", 12, pred).count()
    }
    t("bruteTopKFor-again") {
      graft.ops.Similarity.bruteTopKFor(e, "vec_id", "embedding", 12, pred).count()
    }
    t("full-mmr") {
      graft.ops.Similarity.mmrSelect(e, "vec_id", "embedding", pred, 12, 5).count()
    }
    t("full-mmr-again") {
      graft.ops.Similarity.mmrSelect(e, "vec_id", "embedding", pred, 12, 5).count()
    }
    spark.stop()
  }
}
