package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: same-session A/B of the whole-series filtfilt forms on a
  * hobo-shaped series — the ×100 chain-scale tail (SCALING.md). One
  * fixture, one JVM, so co-tenant noise cancels in the ratios; each form
  * runs twice and the min is reported (first pass carries codegen/JIT
  * warmup).
  *
  * Forms: `kernel` (position pass + segment kernel only, no join-back —
  * the irreducible floor), `smj` (unforced join-back, the shipped
  * default), `smjN` for any integer N (same, with
  * spark.sql.shuffle.partitions=N around the op — the partition-count
  * spill knob a cluster would turn), `hash` (forced shuffled-hash
  * build on the narrow side — CRASHES at 50 M × 32 under the 8 GiB
  * local heap; kept to document that), `fused` (wide-row segment pass).
  *
  * Usage: runMain graft.tools.ProbeFiltWl [nRows] [forms] */
object ProbeFiltWl {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50_000_000L)
    val forms = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("kernel", "smj", "smj256", "fused"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // hobo-shaped width: time spine + 5 double channels, one filtered
    val df = spark.range(n).select(
      col("id").as("time"),
      (sin(col("id") / 1000.0) + rand(7) * 0.1).as("P_1ac"),
      (col("id") % 97).cast("double").as("T_28"),
      (col("id") % 13).cast("double").as("x1"),
      (col("id") % 17).cast("double").as("x2"),
      (col("id") % 19).cast("double").as("x3"))
    val sos = graft.kernels.Butterworth.lowpass(4, 1.0 / 300.0, 1.0)
    def time(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[filtwl] $label%-12s $dt%8.2f s")
      dt
    }
    for (form <- forms) {
      val parts = "smj(\\d+)".r.findFirstMatchIn(form).map(_.group(1).toInt)
      def run(): Unit = {
        parts.foreach(p =>
          spark.conf.set("spark.sql.shuffle.partitions", p))
        try {
          form match {
            case "kernel" =>
              val pos = graft.ops.Index
                .withGlobalPosition(df, Seq("time"), "__pos")
              graft.ops.Spectra.segmentFilt(pos, "P_1ac", sos, 65536)
                .toDF().agg(sum(col("value_filt")), count(lit(1))).collect()
            case "fused" =>
              graft.ops.Spectra
                .filterColumnWholeSeriesFused(df, Seq("time"), "P_1ac", sos)
                .agg(sum(col("P_1ac")), count(lit(1))).collect()
            case f =>
              graft.ops.Spectra
                .filterColumnWholeSeriesJoin(df, Seq("time"), "P_1ac", sos,
                  hashHint = f == "hash")
                .agg(sum(col("P_1ac")), count(lit(1))).collect()
          }
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", 32)
          graft.ops.Spread.release(spark)
        }
      }
      val a = time(s"$form/1")(run())
      val b = time(s"$form/2")(run())
      println(f"[filtwl] $form%-12s best ${math.min(a, b)}%8.2f s")
    }
    spark.stop()
  }
}
