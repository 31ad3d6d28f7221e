package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantify the graph_triangles work shape across scale factors: simhash
  * pair count, wedge count (the join's true cost), triangle count, and the
  * largest near-dup component — to adjudicate whether the sf1 curve is
  * plan-driven or output-shape-driven (dev probe). */
object ProbeTri {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val docs = graft.queries.Tables.documents(spark, dir)
      val pairs = graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", "source", 16, 2)
      val ed = pairs.select(
          least(col("id_a"), col("id_b")).as("a"),
          greatest(col("id_a"), col("id_b")).as("b")).distinct()
        .persist()
      val nEdges = ed.count()
      // wedges through the middle node = the enumeration join's row count
      val deg = ed.select(col("a").as("v")).unionAll(ed.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val nWedges = deg.agg(sum(expr("d * (d - 1) div 2"))).head().getLong(0)
      val maxDeg = deg.agg(max("d")).head().getLong(0)
      val tri = graft.ops.Dedup.triangles(pairs, "doc_id")
      val nTri = tri.agg(sum("n_triangles")).head().getLong(0) / 3
      println(s"[tri] $dir edges=$nEdges wedges=$nWedges maxDeg=$maxDeg triangles=$nTri")
      ed.unpersist()
    }
    spark.stop()
  }
}
