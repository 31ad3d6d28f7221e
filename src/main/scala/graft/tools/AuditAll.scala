package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale anti-pattern sweep over every registered query (dev tool): flags
  * single-partition windows (empty partitionSpec serializes the table
  * through one task at scale) and cartesian products in the physical plan. */
object AuditAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val bad = scala.collection.mutable.Buffer[String]()
        plan.foreach {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => bad += "GLOBAL-WINDOW"
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
              if w.partitionSpec.isEmpty => bad += "GLOBAL-WINDOW-LIMIT"
          case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
            bad += "CARTESIAN"
          case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
            // the non-equi fallback: per-task scans of the whole broadcast
            // side — a scale smell even when the broadcast side is small
            bad += "BNL-JOIN"
          case _ =>
        }
        if (bad.nonEmpty) { flagged += 1
          println(s"[audit] $name: ${bad.distinct.mkString(",")}")
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"[audit] $name: ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(100)}")
      }
    }
    println(s"[audit] done, $flagged flagged of ${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}
