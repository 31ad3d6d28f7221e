package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the DIWASP input/kernel split (dev tool). */
object ProbeDiwasp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val qs = graft.SparkEntry.queries
    spark.read.parquet(s"$sfDir/events.parquet").count()
    time("dftm 1st")(qs("diwasp_dftm")(spark, sfDir).count())
    time("dftm 2nd")(qs("diwasp_dftm")(spark, sfDir).count())
    time("imlm")(qs("diwasp_imlm")(spark, sfDir).count())
    time("wave_stats_pressure")(qs("wave_stats_pressure")(spark, sfDir).count())
    time("burst_roundtrip")(qs("burst_roundtrip")(spark, sfDir).count())
    time("atmos_profile")(qs("atmos_profile")(spark, sfDir).count())
    spark.stop()
  }
}
