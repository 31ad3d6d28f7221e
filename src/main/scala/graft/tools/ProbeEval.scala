package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Sketches, TextAnalysis => TA}

/** Dev probe: time the sub-stages of the KMV sketch queries. */
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("warmup")(docs.groupBy("source").count().count())
    val tri = docs.select(col("source"),
      explode(TA.wordNgrams(TA.tokens(col("text")), 3)).as("tri"))
    t("explode")(tri.count())
    t("explode_distinct")(tri.distinct().count())
    t("hash60")(tri.distinct()
      .select(col("source"), Sketches.hash60(col("tri")).as("__h")).distinct().count())
    t("registers")(Sketches.kmvRegisters(tri, "source", "tri").count())
    t("kmv_distinct")(Sketches.kmvDistinct(tri, "source", "tri").count())
    spark.stop()
  }
}
