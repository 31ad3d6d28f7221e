package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup outside the measured section: JVM/codegen spin-up and parquet
    // footer reads otherwise land entirely on the first (alphabetical) query
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      try { spark.read.parquet(s"$sfDir/$t.parquet").count() }
      catch { case _: Throwable => () }
    }
    // deterministic (sorted) execution order so per-query timings are
    // comparable across rounds; best-of-2 per query filters scheduler /
    // codegen-compilation noise out of the measurement
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val debug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    // a query that throws must NOT masquerade as a fast timing (r6 shipped 22
    // analysis-broken queries as innocent 0.05 s rows): record it here and
    // surface a "failed" list on the JSON line + stderr
    val failed = scala.collection.mutable.SortedSet[String]()
    def runOnce(tag: String): Map[String, Double] = names.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench:$tag] FAILED $name: ${e.getMessage.linesIterator.next()}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (debug) System.err.println(f"[bench:$tag] $name%-28s $dt%7.3f s")
      // query-completion cache hook — without it, shared() persists from all
      // 174 queries × 2 passes stay pinned for the session (r6: 16× slowdowns)
      graft.ops.Spread.release(spark)
      name -> dt
    }.toMap
    val r1 = runOnce("r1")
    val r2 = runOnce("r2")
    val results = r1.map { case (k, v) => k -> math.min(v, r2(k)) }
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qjson(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val sorted = results.toSeq.sortBy(_._1)
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${qjson(sorted)},"failed":$failedJson,"sf":"$sfDir"}"""
    // full per-query map (~3 KB for 100+ queries) exceeds the output-tail
    // window the driver captures — keep it on disk + one full stdout line,
    // and END with a compact line (total + slowest 20) that fits the tail
    // whole and parses standalone
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json", "UTF-8")
      w.println(full); w.close()
    } catch { case _: Throwable => () }
    println(full)
    val top = results.toSeq.sortBy(-_._2).take(20)
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"queries":${qjson(top)},"detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
