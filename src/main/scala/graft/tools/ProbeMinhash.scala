package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the minhash-LSH stages (dev tool). */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    df.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    import graft.ops.{Dedup, Spread}
    val sh = Dedup.charShingles(Spread.byKey(df, col("doc_id")), "doc_id", "text", 3)
      .withColumn("x", Dedup.shingleKey(col("sh")).cast("long"))
    time("shingles explode+key")(sh.count())
    // profile the PRODUCTION signature path (limb-modmul hash family) —
    // a hand-copied naive (a·x+b)%P here would measure a different
    // expression than the library ships (and overflow on emoji corpora)
    time("wide signatures")(
      Dedup.wideSignatures(df, "doc_id", "text", 16).count())
    time("full pairs (1st)")(Dedup.minhashLshPairs(df, "doc_id", "text", 16, 2, 0.7).count())
    time("full pairs (2nd)")(Dedup.minhashLshPairs(df, "doc_id", "text", 16, 2, 0.7).count())
    spark.stop()
  }
}
