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

  test("readPrior is total: missing file and garbage both yield empty") {
    assert(Bench.readPrior("/nonexistent/path.json").isEmpty)
    val f = java.nio.file.Files.createTempFile("benchspec", ".json")
    java.nio.file.Files.writeString(f, "{not json at all")
    assert(Bench.readPrior(f.toString).isEmpty)
    java.nio.file.Files.delete(f)
  }
}
