package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's noise machinery must not rot silently: the control
  * block is the noise DETECTOR, so a renamed control query or a prior file
  * the parser can't read would quietly disable it. */
class BenchSpec extends AnyFunSuite {

  test("every control query is a registered query") {
    val reg = SparkEntry.queries.keySet
    val missing = Bench.ControlQueries.filterNot(reg.contains)
    assert(missing.isEmpty,
      s"control queries not in SparkEntry.queries: $missing — renaming a " +
        "control query silently shrinks the noise detector's sample")
  }

  test("readPrior parses the exact format the harness writes") {
    val f = java.nio.file.Files.createTempFile("benchspec", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":12.345,"unit":"sec","queries":{"a_q":0.123,"b_q":4.5},"failed":[],"noise_index":1.010,"control_vs_prior":1.000,"noisy":false,"control_start":{"a_q":0.2},"control_end":{"a_q":0.1},"reruns":[],"sf":"x"}""")
    val m = Bench.readPrior(f.toString)
    assert(m == Map("a_q" -> 0.123, "b_q" -> 4.5),
      "must read ONLY the queries map, not the control blocks after it")
    java.nio.file.Files.delete(f)
  }

  // --- the r16 laundering bug: a 2x steady load was accepted as
  // `control_vs_prior 1.000 / noisy false` because the detector anchored
  // to the gitignored live stamp written in the same loaded window ---

  private def writeDetail(dir: java.nio.file.Path, name: String,
                          qs: Map[String, Double]): Unit = {
    val body = qs.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString(",")
    java.nio.file.Files.writeString(dir.resolve(name),
      s"""{"metric":"total","value":1.0,"unit":"sec","queries":{$body},"failed":[],"sf":"x"}""")
  }

  test("committedPrior ignores the live stamp; livePrior prefers it") {
    val dir = java.nio.file.Files.createTempDirectory("benchspec")
    val quiet = Map("rotate_magvar" -> 0.1, "text_tokens" -> 0.1)
    val loaded = quiet.map { case (k, v) => k -> v * 2.0 }
    writeDetail(dir, "BENCH_DETAIL_r3.json", Map("rotate_magvar" -> 9.9))
    writeDetail(dir, "BENCH_DETAIL_r14.json", quiet)   // newest committed
    writeDetail(dir, "BENCH_DETAIL.json", loaded)      // live, same-window
    writeDetail(dir, "BENCH_DETAIL_NOISY.json", Map("rotate_magvar" -> 7.7))
    assert(Bench.committedPrior(dir.toString) == quiet,
      "steady-load anchor must be the newest COMMITTED round stamp — " +
        "never the live file a loaded run just wrote")
    assert(Bench.livePrior(dir.toString) == loaded,
      "the mover-rerun seed SHOULD prefer the live stamp (freshest " +
        "same-machine timings; it never adjudicates noisy)")
    dir.toFile.listFiles.foreach(_.delete()); dir.toFile.delete()
  }

  test("2x steady load flips noisy even when the live prior is equally slow") {
    // controls measured under a steady 2x co-tenant: no start/end drift
    val (drift, vsPrior, noisy) =
      Bench.noiseVerdict(ctlStartTotal = 0.92, ctlEndTotal = 0.91,
        ctlPriorTotal = Some(0.455)) // committed quiet anchor (r14 value)
    assert(math.abs(drift - 0.989) < 0.01)
    assert(vsPrior.exists(r => math.abs(r - 2.0) < 0.01))
    assert(noisy, "the exact r16 failure: steady 2x load with flat drift " +
      "must be flagged when judged against the committed quiet anchor")
  }

  test("a run much FASTER than the anchor is also flagged (loaded anchor)") {
    val (_, vsPrior, noisy) =
      Bench.noiseVerdict(1.0, 1.0, Some(2.0))
    assert(vsPrior.contains(0.5) && noisy,
      "an anchor stamped under load makes a quiet run look like a fake " +
        "improvement — flag it so the anchor gets re-stamped")
  }

  test("absent anchor disables detector 2 visibly, not vacuously") {
    val (_, vsPrior, noisy) = Bench.noiseVerdict(1.0, 1.0, None)
    assert(vsPrior.isEmpty, "no committed prior => control_vs_prior null")
    assert(!noisy)
    val (_, vsPrior0, _) = Bench.noiseVerdict(1.0, 1.0, Some(0.0))
    assert(vsPrior0.isEmpty, "zero-total prior must not divide")
  }

  test("drift thresholds are asymmetric around the known warmth bias") {
    // prior None so ONLY the drift detector is under test
    def n(drift: Double) = Bench.noiseVerdict(1.0, drift, None)._3
    assert(!n(0.70), "undisturbed JIT warmth measures end/start 0.72-0.77" +
      " — must not be a false positive")
    assert(n(0.50), "a co-tenant LEAVING mid-suite is still noise")
    assert(n(1.60), "a co-tenant arriving is noise")
    assert(!n(1.40))
  }

  test("readPrior is total: missing file and garbage both yield empty") {
    assert(Bench.readPrior("/nonexistent/path.json").isEmpty)
    val f = java.nio.file.Files.createTempFile("benchspec", ".json")
    java.nio.file.Files.writeString(f, "{not json at all")
    assert(Bench.readPrior(f.toString).isEmpty)
    java.nio.file.Files.delete(f)
  }
}
