package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis => TA}

object ProbeSpans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n")
    }
    // current: groupBy + join back on string key
    time("current join-back") {
      graft.ops.Curation.repeatedSpans(docs, "doc_id", "text", 3).count()
    }
    // window count over ngram partition
    time("window count") {
      val grams = docs.select(col("doc_id"),
        posexplode(TA.wordNgrams(TA.tokens(col("text")), 3)).as(Seq("pos", "ngram")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("ngram")
      grams.withColumn("cnt", count(lit(1)).over(w)).filter(col("cnt") > 1).count()
    }
    // groupBy + join back, input spread to 32 partitions first
    time("join-back + spread") {
      val d2 = docs.repartition(32)
      graft.ops.Curation.repeatedSpans(d2, "doc_id", "text", 3).count()
    }
    spark.stop()
  }
}
