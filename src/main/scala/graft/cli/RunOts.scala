package graft.cli

import graft.core.Meta
import graft.io.{Config, Netcdf3, Readers, Rsk, Sink}
import graft.ops.{Clip, Qaqc, Spectra, Trims, Burst}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The runots-shaped CLI (SURVEY §3): one entry point fronting
 * (instrument, step) pipelines, driven by the merged gatts+YAML config —
 * the reference's `runots <inst> <step>` dispatch
 * (stglib/core/runcmd.py:527-613).
 *
 * Steps implement the reference lifecycle:
 *   ingest : instrument file → EPIC/CF long-format parquet ("-raw")
 *   clean  : raw → clip → atmos-correct → call_qaqc → stats → parquet ("b")
 *   waves  : clean → burst reshape → Welch wave statistics → trims ("s-a")
 *
 * `runPipeline` is the minimum end-to-end slice of SURVEY §7.3 (the RBR
 * pressure-logger wave chain: stglib/rsk/csv2cdf.py:11 → rsk/cdf2nc.py:8 →
 * rsk/nc2waves.py:9 → core/waves.py:571).
 */
object RunOts {

  def main(args: Array[String]): Unit = {
    if (args.length < 5) {
      System.err.println(
        "usage: RunOts <instrument> <step> <gatts> <yaml> <input> [output]")
      sys.exit(2)
    }
    val Array(instrument, step, gattsPath, yamlPath, input) = args.take(5)
    val output = if (args.length > 5) args(5) else input + s".$step"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val (meta, collisions) = Config.merge(
      Config.readGlobalAttsFile(gattsPath), Config.readYamlFile(yamlPath))
    collisions.foreach(k => System.err.println(s"[runots] config overrides gatts key: $k"))
    runStep(spark, instrument, step, meta, input, output)
    spark.stop()
  }

  /** Dispatch table — (instrument, step) → pipeline. Instruments sharing the
    * CSV family route to the same implementations (the reference's registry
    * pattern, stglib/core/runcmd.py:527-599). */
  def runStep(spark: SparkSession, instrument: String, step: String,
              meta: Meta, input: String, output: String): Unit = step match {
    case "ingest" => ingest(spark, meta, input, output)
    case "clean"  => clean(spark, meta, input, output)
    case "waves"  => waves(spark, meta, input, output)
    case "export" => export(spark, meta, input, output)
    case other    => throw new IllegalArgumentException(s"unknown step $other")
  }

  /** Instrument file → renamed, clock-corrected long-format raw parquet.
    * Native `.rsk` (SQLite) deployments route to the binary reader; the CSV
    * family goes through the framework reader (reference registry pattern,
    * stglib/core/runcmd.py:527-599). */
  def ingest(spark: SparkSession, meta: Meta, input: String, output: String): Unit = {
    val df =
      if (input.toLowerCase.endsWith(".rsk")) {
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(input))
        // tstamp is ms epoch (rsk2cdf.py); channelNN→EPIC names come from
        // config keys `rename_<channel>` (the reference hardcodes channel01=
        // pressure per instrument family)
        var d = Rsk.readSeries(spark, bytes)
          .withColumn("time", expr("timestamp_millis(tstamp)")).drop("tstamp")
        meta.attrs.foreach { case (k, v) =>
          if (k.startsWith("rename_") && d.columns.contains(k.stripPrefix("rename_")))
            d = d.withColumnRenamed(k.stripPrefix("rename_"), v.toString)
        }
        Readers.withCfMetadata(d)
      } else if (input.toLowerCase.endsWith(".log")) {
        // EofE ECHOLOGGER point data; time parsed from the per-ping UTC stamp
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(input))
        graft.io.Eofe.readPoint(spark, bytes)
          .withColumn("time", to_timestamp(col("timeUtc"))).drop("timeUtc")
      } else if (input.toLowerCase.endsWith(".tid")) {
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(input)), "US-ASCII")
        graft.io.Seagauge.readTid(spark, text)
          .withColumn("time", to_timestamp(col("time"), "MM/dd/yyyy HH:mm:ss"))
          .withColumnRenamed("p_dbar", "P_1").withColumnRenamed("temp_c", "T_28")
      } else if (input.toLowerCase.endsWith(".wb")) {
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(input)), "US-ASCII")
        graft.io.Seagauge.readWb(spark, text)
          .withColumn("time", expr("timestamp_seconds(startTime)"))
          .withColumnRenamed("p_dbar", "P_1")
      } else Readers.readInstrumentCsv(spark, input, meta)
    val shifted = Readers.applyClockError(df, "time", meta)
    Sink.writeParquet(shifted, output, Sink.insertHistory(meta,
      s"Ingested $input.", "1970-01-01T00:00:00Z"), float32 = false)
  }

  /** Final export: processed parquet → netCDF-3 classic (the reference's
    * `to_netcdf(unlimited_dims=["time"])` sink). Numeric columns become
    * record variables; metadata attrs travel as global attributes. */
  def export(spark: SparkSession, meta: Meta, input: String, output: String): Unit = {
    val df0 = spark.read.parquet(input)
    val numeric = df0.schema.fields.filter(f => f.dataType.typeName match {
      case "double" | "float" | "integer" | "long" | "timestamp" => true
      case _ => false
    }).map(_.name).toSeq
    val ordered = (if (numeric.contains("time")) Seq("time") else Nil) ++
      numeric.filterNot(_ == "time")
    val df = df0.select(ordered.map { c =>
      if (df0.schema(c).dataType.typeName == "timestamp")
        (col(c).cast("double")).as(c) // CF seconds-since-epoch
      else col(c)
    }: _*)
    val gatts = meta.attrs.toSeq.sortBy(_._1)
      .map { case (k, v) => k -> v.toString }
    val varAttrs = if (ordered.contains("time"))
      Map("time" -> Seq("units" -> "seconds since 1970-01-01T00:00:00Z",
        "standard_name" -> "time")) else Map.empty[String, Seq[(String, String)]]
    Netcdf3.write(df, output, gatts, varAttrs)
  }

  /** Raw parquet → deployment clip → atmospheric correction → call_qaqc →
    * clean parquet. */
  def clean(spark: SparkSession, meta: Meta, input: String, output: String): Unit = {
    var df = spark.read.parquet(input)
    df = Clip.clipDs(df, meta)
    // atmos_correct: constant offset path when atmpres is a scalar attr
    // (full as-of join path is ops.Align when an aux series is configured)
    meta.dbl("atmpres").foreach { atm =>
      if (df.columns.contains("P_1"))
        df = df.withColumn("P_1ac", col("P_1") - atm)
    }
    val dataVars = df.columns.filterNot(Seq("time").contains).toSeq
    df = Trims.nanToNull(df, dataVars.filter(c =>
      df.schema(c).dataType.typeName == "double"))
    df = Qaqc.applyAll(df, meta, dataVars, order = Seq("time"), part = Nil)
    Sink.writeParquet(df, output, Sink.insertHistory(meta,
      "Clipped, corrected, QA/QC applied.", "1970-01-01T00:00:00Z"), float32 = false)
  }

  /** Clean parquet → burst reshape → Welch wave statistics → stat trims. */
  def waves(spark: SparkSession, meta: Meta, input: String, output: String): Unit = {
    val df = spark.read.parquet(input)
    val presVar = if (df.columns.contains("P_1ac")) "P_1ac" else "P_1"
    val nsamps = meta.int("wave_nsamps").getOrElse(512)
    val fs = 1.0 / meta.dbl("sample_interval").getOrElse(1.0)
    val z = meta.dbl("pressure_sensor_height")
      .orElse(meta.dbl("initial_instrument_height")).getOrElse(0.0)
    val bursts = Burst.fromContinuous(df, order = Seq("time"), part = Nil,
      nsamps = nsamps, burstCol = "burst", sampleCol = "sample")
    var stats = Spectra.waveStatsFromPressure(bursts, "burst", "sample", presVar,
      fs = fs, z = z,
      nsegs = meta.int("spec_nsegs").getOrElse(16),
      fcut = meta.dbl("wave_fcut"),
      kpmin = meta.dbl("wave_Kpmin")).toDF()
    // wave-product trims (stglib/core/utils.py:752-828)
    meta.dbl("wp_max").foreach { m =>
      val c = col("wp_peak") < m && col("wp_4060") < m
      stats = stats.withColumn("wp_peak", when(c, col("wp_peak")))
        .withColumn("wp_4060", when(c, col("wp_4060")))
    }
    meta.dbl("wh_min").foreach { m =>
      for (v <- Seq("wp_peak", "wh_4061", "wp_4060"))
        stats = stats.withColumn(v, when(col("wh_4061") > m, col(v)))
    }
    meta.dbl("wh_max").foreach { m =>
      for (v <- Seq("wp_peak", "wh_4061", "wp_4060"))
        stats = stats.withColumn(v, when(col("wh_4061") < m, col(v)))
    }
    Sink.writeParquet(stats, output, Sink.insertHistory(meta,
      "Wave statistics computed.", "1970-01-01T00:00:00Z"), float32 = false)
  }
}
