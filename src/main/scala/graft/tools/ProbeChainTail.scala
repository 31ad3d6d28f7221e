package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the two ×100 chain-scale tails (eofe/clean 9.3×,
  * hobo/clean 10.1× on 10× data — SCALING.md): re-runs each chain at a
  * given multiplier with stages progressively stripped, so the wall
  * attributes to kernel-linear work vs hidden re-shuffle/re-read.
  * Usage: runMain graft.tools.ProbeChainTail [mult] */
object ProbeChainTail {
  import graft.core.Meta
  import graft.cli.RunOts

  def main(args: Array[String]): Unit = {
    val m = args.headOption.map(_.toDouble).getOrElse(100.0)
    // optional 2nd arg: substring filter on variant labels (dev iteration)
    val sel: String => Boolean =
      args.lift(1).map(f => (l: String) => l.contains(f))
        .getOrElse(_ => true)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[tail] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    // single-core fixed-work load marker: ~1.3 s on a quiet core; co-tenant
    // load shows up as a proportional slowdown, making cross-run chain
    // numbers normalizable (NOTES r16 measured 3.2-3.5 s under the load
    // that poisoned BENCH_r15)
    def loadMarker(): Unit = {
      val t0 = System.nanoTime()
      var x = 1.0; var i = 0
      while (i < 200000000) { x = x * 1.0000000001 + 1e-12; i += 1 }
      if (x < 0) println(x) // defeat DCE
      println(f"[tail] load-marker                  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    loadMarker()
    // sequential-IO marker: the chains' heavy sections are shuffle/spill
    // disk IO, and r17 measured 2-3x wall swings on adjacent runs with
    // QUIET cpu markers — write+read 1 GiB so disk co-tenancy is visible
    def ioMarker(): Unit = {
      val t0 = System.nanoTime()
      val f = java.io.File.createTempFile("tailprobe-io", ".bin")
      val buf = new Array[Byte](1 << 20)
      val out = new java.io.FileOutputStream(f)
      var i = 0
      while (i < 1024) { out.write(buf); i += 1 }
      out.close()
      val in = new java.io.FileInputStream(f)
      while (in.read(buf) > 0) ()
      in.close(); f.delete()
      println(f"[tail] io-marker (1GiB w+r)         ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    ioMarker()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
    }

    // ---- hobo: atmos -> NAVD88 water level -> whole-series filtfilt ----
    val hoboFull = Map[String, Any]("atmpres" -> 10.0, "NAVD88_ref" -> -1.25,
      "filtered_wl" -> "true", "sample_interval" -> 1.0,
      "average_salinity" -> 30.0, "initial_instrument_height" -> 0.25,
      "latitude" -> 30.0)
    val hoboVariants = Seq(
      "hobo/full" -> hoboFull,
      "hobo/no_filt" -> (hoboFull - "filtered_wl"),
      "hobo/no_wl" -> (hoboFull - "filtered_wl" - "NAVD88_ref" - "latitude"))
    for ((label, meta) <- hoboVariants if sel(label)) {
      val dir = java.nio.file.Files.createTempDirectory("tailprobe").toFile
      def p(n: String) = new java.io.File(dir, n).getAbsolutePath
      ChainFixtures.all.find(_.label == "hobo/clean").get.gen(spark, m, p)
      time(label) {
        RunOts.runStep(spark, "hobo", "clean", Meta(meta),
          p("hoboraw"), p("hoboclean"))
      }
      rm(dir)
    }

    // ---- eofe: point + profile branches, trim_alt, brange, bin geom ----
    val eofeFull = Map[String, Any]("trim_method" -> "altitude",
      "EADeadzone_m" -> 0.1, "EARange_m" -> 10.0,
      "EABin_size_m" -> 0.5, "EASoundSpeed_mps" -> 1500.0,
      "average_salinity" -> 32.0, "WATER_DEPTH" -> 10.0,
      "orientation" -> "UP", "initial_instrument_height" -> 1.0)
    val eofeVariants = Seq(
      ("eofe/full", eofeFull, true),
      ("eofe/no_trim", eofeFull - "trim_method", true),
      ("eofe/point_only", eofeFull, false),
      ("eofe/point_no_trim", eofeFull - "trim_method", false))
    for ((label, meta, withProfiles) <- eofeVariants if sel(label)) {
      val dir = java.nio.file.Files.createTempDirectory("tailprobe").toFile
      def p(n: String) = new java.io.File(dir, n).getAbsolutePath
      ChainFixtures.all.find(_.label == "eofe/clean").get.gen(spark, m, p)
      if (!withProfiles) rm(new java.io.File(p("earaw_profiles")))
      time(label) {
        RunOts.runStep(spark, "eofe", "clean", Meta(meta),
          p("earaw"), p("eaclean"))
      }
      rm(dir)
    }
    spark.stop()
  }
}
