package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale anti-pattern sweep (dev tool) over BOTH surfaces: every registered
  * query AND every CLI chain product frame (clean/waves/diwasp per family,
  * observed through [[graft.io.Sink.planProbe]] on synthetic fixture
  * inputs). Flags single-partition windows (empty partitionSpec serializes
  * the table through one task at scale), cartesian products, and
  * non-1-row broadcast-nested-loop builds in the physical plan. */
object AuditAll {

  // conservatively prove a subtree produces at most one row: groupless
  // aggregates are 1-row; joins of 1-row sides stay 1-row; unary nodes
  // (project/filter/exchange/sort) preserve the bound. A BNL/cartesian
  // against such a side is the legitimate scalar-attach shape (corpus
  // totals, extents, trained 1-row models) — each task scans ONE row —
  // and must not drown out real data×data fallbacks.
  private def oneRow(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
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

  /** The distinct anti-pattern flags in a frame's executed plan. */
  def flagsOf(df: DataFrame): Seq[String] = {
    val bad = scala.collection.mutable.Buffer[String]()
    df.queryExecution.executedPlan.foreach {
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
    bad.distinct.toSeq
  }

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
        val bad = flagsOf(fn(spark, sfDir))
        if (bad.nonEmpty && allowedBnl.contains(name) &&
            bad.forall(Set("BNL-JOIN", "CARTESIAN"))) {
          // model-bounded non-equi joins plan as BNL or cartesian depending
          // on sizes — the justification covers both physical forms
          println(s"[audit] $name: ${bad.mkString(",")} " +
            s"(allowed: ${allowedBnl(name)})")
        } else if (bad.nonEmpty) { flagged += 1
          println(s"[audit] $name: ${bad.mkString(",")}")
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"[audit] $name: ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(100)}")
      }
    }
    println(s"[audit] done, $flagged flagged of ${graft.SparkEntry.queries.size}")
    val chainFlagged = auditChains(spark)
    println(s"[audit] chains done, $chainFlagged flagged")
    spark.stop()
    if (flagged + chainFlagged > 0) sys.exit(1)
  }

  /** Run each per-family CLI chain on a synthetic fixture deployment with
    * [[graft.io.Sink.planProbe]] installed, sweeping every product frame
    * the chain writes with the same flags as the registered queries. The
    * fixtures mirror RunOtsSpec's minimal-input shapes. */
  def auditChains(spark: SparkSession): Int = {
    import spark.implicits._
    import graft.core.Meta
    import graft.cli.RunOts
    val dir = java.nio.file.Files.createTempDirectory("audit_chains").toFile
    def p(n: String) = new java.io.File(dir, n).getAbsolutePath
    val t0 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)

    // ---- fixture deployments (minimal but plural rows) ------------------
    // IQ: flow + profile siblings
    (0 until 16).map(i => (ts(i), 1.5 + 0.01 * i, Seq(0.1, 0.2, 0.3, 0.4)))
      .toDF("time", "Pressure", "SNR").write.parquet(p("iqraw"))
    (for (i <- 0 until 16; b <- 0 until 2; k <- 0 until 3) yield
      (ts(i), b, k, 0.4 + 0.1 * k, 5.0 + k))
      .toDF("time", "beam", "bin", "bindist", "Vel")
      .write.parquet(p("iqraw_profiles"))
    // ABSS: abs spine + aux
    (for (i <- 0 until 8; k <- 0 until 3) yield
      (ts(i * 600), i.toLong, 1.0e6, k, 0.3 + 0.1 * k, 0, 0.5 + 0.01 * k))
      .toDF("time", "burst_number", "xdcr_freq", "bin", "bindist",
        "sample", "abs").write.parquet(p("abraw"))
    (for (i <- 0 until 8; s <- 0 until 2) yield (ts(i * 600), s))
      .toDF("time", "aux_sample").write.parquet(p("abraw_aux"))
    // EofE: point frame
    (for (b <- 0L until 4L; s <- 0L until 4L) yield
      (ts(b * 60 + s), b, s, 0.2 + 0.01 * s))
      .toDF("time", "burst", "sample", "pitchDeg").write.parquet(p("earaw"))
    // LISST: burst cadence (4 bursts of 4 samples at 1 s, 10 min apart)
    // + partial tail + the (time, ring) vc sibling
    val ltimes = (0 until 4).flatMap(b => (0 until 4).map(s => b * 600L + s)) ++
      Seq(2400L, 2401L)
    ltimes.zipWithIndex.map { case (s, i) => (ts(s), 2.0 + 0.01 * i) }
      .toDF("time", "depth").write.parquet(p("liraw"))
    ltimes.flatMap(s => (1 to 3).map(r => (ts(s), r, 0.5 * r)))
      .toDF("time", "ring", "vc").write.parquet(p("liraw_vc"))
    // met: generic family columns on a 10-min cadence with a gap
    Seq(0L, 600L, 1800L, 2400L, 3000L).zipWithIndex.map { case (s, i) =>
      (ts(s), 350.0 - i, 5.0 + i, 12.0 + 0.1 * i) }
      .toDF("time", "WindDir_avg", "WindSpeed_avg", "Temp")
      .write.parquet(p("metraw"))
    // rdi: renamed-family beam columns
    (for (i <- 0 until 8; k <- 0 until 3) yield
      (ts(i), k, 0.5 + 0.25 * k, 90.0 + k, 120.0 + k))
      .toDF("time", "bin", "bindistM", "cor1", "AGC1")
      .write.parquet(p("rdiraw"))
    // common (rsk/exo/hobo-class): continuous pressure series, also the
    // waves/diwasp input once burst-reshaped (2 bursts x 64 samples)
    (0 until 128).map { i =>
      (ts(i), 10.0 + math.sin(i * 0.3), 0.1 * math.cos(i * 0.3),
        0.1 * math.sin(i * 0.31), i / 64, i % 64) }
      .toDF("time", "P_1", "u", "v", "burst", "sample")
      .write.parquet(p("comraw"))

    // ---- run the chains with the plan probe on --------------------------
    val results = scala.collection.mutable.Buffer[(String, Seq[String])]()
    graft.io.Sink.planProbe = Some { (path, df) =>
      results += ((new java.io.File(path).getName, flagsOf(df)))
    }
    var flagged = 0
    def run(label: String)(body: => Unit): Unit = {
      results.clear()
      try {
        body
        for ((out, flags) <- results) {
          if (flags.nonEmpty) flagged += 1
          println(s"[audit] chain $label -> $out: " +
            (if (flags.isEmpty) "ok" else flags.mkString(",")))
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"[audit] chain $label: ERROR " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    try {
      run("iq/clean") {
        RunOts.runStep(spark, "iq", "clean",
          Meta(Map("orientation" -> "DOWN")), p("iqraw"), p("iqclean"))
      }
      run("abss/clean") {
        RunOts.runStep(spark, "abss", "clean",
          Meta(Map.empty[String, Any]), p("abraw"), p("abclean"))
      }
      run("eofe/clean") {
        RunOts.runStep(spark, "eofe", "clean",
          Meta(Map.empty[String, Any]), p("earaw"), p("eaclean"))
      }
      run("lisst/clean") {
        RunOts.runStep(spark, "lisst", "clean",
          Meta(Map("operating_mode" -> "burst", "depth_max" -> 100.0)),
          p("liraw"), p("liclean"))
      }
      run("met/clean") {
        RunOts.runStep(spark, "met", "clean",
          Meta(Map("magnetic_variation" -> 15.0)), p("metraw"), p("metclean"))
      }
      run("rdi/clean") {
        RunOts.runStep(spark, "rdi", "clean",
          Meta(Map.empty[String, Any]), p("rdiraw"), p("rdiclean"))
      }
      run("rsk/clean") {
        RunOts.runStep(spark, "rsk", "clean",
          Meta(Map.empty[String, Any]), p("comraw"), p("comclean"))
      }
      run("rsk/waves") {
        RunOts.runStep(spark, "rsk", "waves",
          Meta(Map("wave_nsamps" -> 64, "sample_interval" -> 1.0,
            "pressure_sensor_height" -> 0.5)), p("comclean"), p("comwaves"))
      }
      run("rsk/diwasp") {
        RunOts.runStep(spark, "rsk", "diwasp",
          Meta(Map("wave_nsamps" -> 64, "sample_interval" -> 1.0,
            "pressure_sensor_height" -> 0.5, "WATER_DEPTH" -> 10.0,
            "diwasp_nfft" -> 64, "diwasp_dres" -> 18)),
          p("comclean"), p("comdiwasp"))
      }
    } finally graft.io.Sink.planProbe = None
    flagged
  }
}
