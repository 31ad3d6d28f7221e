package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object ProbeIdx {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    println("[probe] rows=" + df.count())
    def time(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $l%-24s ${(System.nanoTime()-t0)/1e9}%7.2f s (n=$n)")
    }
    time("window rn (1st)")(df.withColumn("rn",
      row_number().over(Window.orderBy("ts","event_id")) - 1)
      .agg(sum("rn")).collect()(0).getLong(0))
    time("index rn (1st)")(graft.ops.Index.withGlobalPosition(df, Seq("ts","event_id"), "rn")
      .agg(sum("rn")).collect()(0).getLong(0))
    time("window rn (2nd)")(df.withColumn("rn",
      row_number().over(Window.orderBy("ts","event_id")) - 1)
      .agg(sum("rn")).collect()(0).getLong(0))
    time("index rn (2nd)")(graft.ops.Index.withGlobalPosition(df, Seq("ts","event_id"), "rn")
      .agg(sum("rn")).collect()(0).getLong(0))
    spark.stop()
  }
}
