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
      // AQE wraps the physical plan in AdaptiveSparkPlanExec, whose
      // children are hidden from foreach — with it on, every check below
      // silently sees only the wrapper node. The static plan has the same
      // window/join shapes the audit is looking for.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // conservatively prove a subtree produces at most one row: groupless
    // aggregates are 1-row; joins of 1-row sides stay 1-row; unary nodes
    // (project/filter/exchange/sort) preserve the bound. A BNL/cartesian
    // against such a side is the legitimate scalar-attach shape (corpus
    // totals, extents, trained 1-row models) — each task scans ONE row —
    // and must not drown out real data×data fallbacks.
    def oneRow(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        a.groupingExpressions.isEmpty
      case l: org.apache.spark.sql.execution.LocalTableScanExec => l.rows.size <= 1
      // a reused exchange is a leaf wrapper — its bound is its original's
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        oneRow(r.child)
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        oneRow(j.left) && oneRow(j.right)
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        oneRow(c.left) && oneRow(c.right)
      case u if u.children.size == 1 => oneRow(u.children.head)
      case _ => false
    }
    // Justified non-1-row BNL exemptions (each bounded by MODEL cardinality,
    // not data size — re-justify before adding entries):
    //   sketch_kmv_jaccard — group×group pair enumeration over the sketch
    //   GROUP set (sources/event types); pairs = groups², groups is a
    //   domain constant, and each probe row is a k-register struct.
    //   nb_isotonic — minimax PAV self-joins over the ≤17-row clamped
    //   calibration-bin table (model-sized, never raw data).
    //   chi2_independence — the langs×sources contingency GRID cross
    //   (domain-bounded group relations; expected counts need every cell).
    val allowedBnl = Map(
      "sketch_kmv_jaccard" -> "group-pair enumeration over the bounded group set",
      "nb_isotonic" -> "self-joins over the 17-bin calibration table",
      "chi2_independence" -> "langs x sources contingency grid cross")
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
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec
              if !oneRow(c.left) && !oneRow(c.right) =>
            bad += "CARTESIAN"
          case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
            // the non-equi fallback: per-task scans of the whole broadcast
            // side — a scale smell UNLESS that side is provably one row
            val build = j.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
              case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
            }
            if (!oneRow(build)) bad += "BNL-JOIN"
          case _ =>
        }
        if (bad.nonEmpty && allowedBnl.contains(name) &&
            bad.distinct.forall(Set("BNL-JOIN", "CARTESIAN"))) {
          // model-bounded non-equi joins plan as BNL or cartesian depending
          // on sizes — the justification covers both physical forms
          println(s"[audit] $name: ${bad.distinct.mkString(",")} " +
            s"(allowed: ${allowedBnl(name)})")
        } else if (bad.nonEmpty) { flagged += 1
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
