package graft.ops

import graft.core.Meta
import graft.kernels.Butterworth
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Config-keyed signal filters in the qaqc orchestrator — the reference's
  * call_qaqc runs filter.apply_butter_filt and filter.apply_med_filt
  * BEFORE every trim (stglib/core/qaqc.py:19-20, filter.py:98-230):
  * `{var}_lowpass_filt` (a period in seconds; cutfreq = 1/period, ford 4,
  * sr from sample_rate or 1/sample_interval) and `{var}_med_filt`
  * (odd-kernel zero-padded median smoother). Both keep the pre-filter
  * values in `{var}_unfiltered`. */
class QaqcFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def series(n: Int): Seq[(Long, Double)] =
    (0 until n).map(i => (i.toLong,
      math.sin(2 * math.Pi * 0.01 * i) + 0.5 * math.sin(2 * math.Pi * 0.4 * i)))

  test("{var}_lowpass_filt runs filtfilt over the whole series") {
    import spark.implicits._
    val rows = series(512)
    val df = rows.toDF("t", "P_1")
    val meta = Meta(Map[String, Any](
      "sample_interval" -> 1.0, "P_1_lowpass_filt" -> 10.0))
    val out = Qaqc.applyVar(df, meta, "P_1", order = Seq("t"), part = Nil)
      .orderBy("t").collect()
    // driver-side referee: the same SOS chain over the collected series
    val sos = Butterworth.lowpass(4, 1.0 / 10.0, 1.0)
    val want = Butterworth.filtfilt(sos, rows.map(_._2).toArray)
    assert(out.length == 512)
    for (i <- 0 until 512) {
      assert(math.abs(out(i).getAs[Double]("P_1") - want(i)) < 1e-9, s"row $i")
      // pre-filter copy preserved
      assert(out(i).getAs[Double]("P_1_unfiltered") == rows(i)._2)
    }
    // the 0.4 Hz component (period 2.5 s < the 10 s cutoff) is attenuated
    val rms = math.sqrt(out.map(r => math.pow(r.getAs[Double]("P_1") -
      math.sin(2 * math.Pi * 0.01 * r.getAs[Long]("t")), 2)).sum / 512)
    assert(rms < 0.1, s"high-frequency energy survived: rms $rms")
  }

  test("all three whole-series filter forms are value-identical") {
    // the smj join-back is the shipped default; the hash-hint and fused
    // forms are kept for A/B probes (SCALING.md r17) and must not rot:
    // same fixed 65536 grid, same margins, same kernel => same bits
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = series(3000)
    val df = rows.toDF("t", "P_1")
      .withColumn("other", col("t") % 7)
    val sos = Butterworth.lowpass(4, 1.0 / 10.0, 1.0)
    def vals(d: org.apache.spark.sql.DataFrame): Seq[Double] =
      d.orderBy("t").collect().map(_.getAs[Double]("P_1")).toSeq
    val smj = vals(Spectra.filterColumnWholeSeriesJoin(
      df, Seq("t"), "P_1", sos, hashHint = false))
    val hash = vals(Spectra.filterColumnWholeSeriesJoin(
      df, Seq("t"), "P_1", sos, hashHint = true))
    val fused = vals(Spectra.filterColumnWholeSeriesFused(
      df, Seq("t"), "P_1", sos))
    assert(smj == hash, "hash-hint form diverged from smj")
    assert(smj == fused, "fused form diverged from smj")
    // and the schema round-trips: same columns, filtered col is double
    val out = Spectra.filterColumnWholeSeriesFused(df, Seq("t"), "P_1", sos)
    assert(out.columns.toSet == Set("t", "P_1", "other"))
  }

  test("{var}_med_filt smooths with scipy's zero-padded median") {
    import spark.implicits._
    val vals = Seq(1.0, 9.0, 2.0, 3.0, 8.0, 4.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("t", "x")
    val meta = Meta(Map[String, Any]("x_med_filt" -> 3))
    val out = Qaqc.applyVar(df, meta, "x", order = Seq("t"), part = Nil)
      .orderBy("t").collect().map(_.getAs[Double]("x"))
    // scipy.signal.medfilt([1,9,2,3,8,4], 3) = [1,2,3,3,4,4]
    // (edges padded with zeros: med(0,1,9)=1, med(8,4,0)=4)
    assert(out.toSeq == Seq(1.0, 2.0, 3.0, 3.0, 4.0, 4.0))
  }

  test("even med kernel and missing sample rate fail loudly") {
    import spark.implicits._
    val df = series(16).toDF("t", "x")
    val even = intercept[IllegalArgumentException] {
      Qaqc.applyVar(df, Meta(Map[String, Any]("x_med_filt" -> 4)),
        "x", Seq("t"), Nil)
    }
    assert(even.getMessage.contains("odd"))
    val noSr = intercept[IllegalArgumentException] {
      Qaqc.applyVar(df, Meta(Map[String, Any]("x_lowpass_filt" -> 10.0)),
        "x", Seq("t"), Nil)
    }
    assert(noSr.getMessage.contains("sample_rate"))
  }
}
