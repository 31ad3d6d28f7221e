package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the ngram-jaccard stages (dev tool). */
object ProbeNgram {
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
    val keys = expr(
      """array_sort(array_distinct(transform(
        |  transform(sequence(1, greatest(length(text) - 2, 1)),
        |            i -> substr(text, i, 3)),
        |  s -> CAST(ascii(substr(s,1,1)) * 65536 + ascii(substr(s,2,1)) * 256
        |            + ascii(substr(s,3,1)) AS BIGINT))))""".stripMargin)
    val sets = df.select(col("source").as("__scope"), col("doc_id").as("__id"),
      keys.as("__keys"))
    time("sets materialize")(sets.agg(sum(size(col("__keys")))).count())
    val cached = sets.cache()
    time("sets cache")(cached.count())
    val a = cached.select(col("__scope"), col("__id").as("id_a"),
      col("__keys").as("__ka"), size(col("__keys")).as("__na"))
    val b = cached.select(col("__scope").as("__scope2"), col("__id").as("id_b"),
      col("__keys").as("__kb"), size(col("__keys")).as("__nb"))
    val joined = a.join(broadcast(b), col("__scope") === col("__scope2") &&
      col("id_a") < col("id_b"))
    time("join only (cached sets)")(joined.count())
    val withI = joined.withColumn("__i",
      graft.functions.ArrayMath.sortedIntersectCount(col("__ka"), col("__kb")))
      .withColumn("jaccard",
        col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")).cast("double"))
      .filter(col("jaccard") >= 0.8)
    time("full pipeline (cached)")(withI.count())
    time("full pipeline (uncached)") {
      graft.ops.Dedup.ngramJaccardPairs(df, "doc_id", "text", "source", 3, 0.8).count()
    }
    spark.stop()
  }
}
