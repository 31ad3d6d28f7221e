package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the perf-critical queries (dev tool):
  * confirms broadcast joins, REPARTITION_BY_NUM exchanges, pushed filters,
  * and pruned read schemas survive plan changes. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("join_asof_nearest", "dedup_embed", "similarity_topk", "q1_agg")
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
