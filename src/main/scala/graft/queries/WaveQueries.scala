package graft.queries

import graft.kernels.Butterworth
import graft.ops.Spectra
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Spectral/wave kernel queries (SURVEY §2.10) — not SQL-expressible, so the
 * driver records rows-only checks; value correctness is covered by the
 * kernel ScalaTest suites (Parseval, dispersion, monochromatic Hs) and the
 * numpy cross-check in tools/.
 *
 * Bursts are synthesized from the events stream: global (ts, event_id) order
 * chopped into fixed-size bursts — the same reshape the reference applies to
 * continuous loggers (make_wave_bursts_mi, stglib/core/waves.py:2037-2091).
 */
object WaveQueries {
  import Tables._

  /** events → long-format (burst, sample, value…) with only full bursts kept. */
  private def bursts(s: org.apache.spark.sql.SparkSession, dir: String, n: Int) = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir)
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("burst", col("user_id") * 1000 + (col("rn") / n).cast("long"))
      .withColumn("sample", col("rn") % n)
      .withColumn("nb", count(lit(1)).over(Window.partitionBy("burst")))
      .filter(col("nb") === n)
  }

  /** Global-order bursts of n samples (for kernels needing long bursts:
    * the elev variant's flo = 32-cycles band requires nsamps >> 64).
    * Whole-series positions come from the ranged two-pass
    * [[graft.ops.Index.withGlobalPosition]] — an unpartitioned row_number
    * window would serialize the events table through one task. */
  private def burstsGlobal(s: org.apache.spark.sql.SparkSession, dir: String, n: Int) = {
    graft.ops.Index.withGlobalPosition(events(s, dir), Seq("ts", "event_id"), "rn")
      .withColumn("burst", (col("rn") / n).cast("long"))
      .withColumn("sample", col("rn") % n)
      .withColumn("nb", count(lit(1)).over(Window.partitionBy("burst")))
      .filter(col("nb") === n)
  }

  /** Shared synthetic PUV bursts: 8 s wave toward 30 deg (trig convention)
    * with linear-theory-consistent amplitudes. */
  private def puvBursts(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val f0 = 0.125
    val k = graft.kernels.Diwasp.wavenumber(2 * math.Pi * f0, 10.0)
    val aP = 0.5 * math.cosh(k * 0.5) / math.cosh(k * 10.0)
    val aU = 0.5 * 2 * math.Pi * f0 * math.cosh(k * 1.0) / math.sinh(k * 10.0)
    val dirR = math.toRadians(30.0)
    val ph = col("sample") * lit(2.0 * math.Pi * f0)
    // sensor noise must be DECORRELATED across p/u/v: with identical noise
    // the cross-spectral matrix is rank-1 (perfectly coherent) and the
    // matrix-inverting IMLM estimator blows up — only the direct DFTM
    // survives. Distinct integer mixes of `value` give pseudo-independent
    // deterministic noise per sensor.
    burstsGlobal(s, dir, 512)
      .withColumn("p", lit(aP) * cos(ph) + (col("value") * 7919.0 % 97.0) / 5000.0)
      .withColumn("u", lit(aU * math.cos(dirR)) * cos(ph) + (col("value") * 104729.0 % 89.0) / 5000.0)
      .withColumn("v", lit(aU * math.sin(dirR)) * cos(ph) + (col("value") * 15485863.0 % 83.0) / 5000.0)
      .toDF()
  }

  def qs: Seq[Q] = Seq(
    // Welch pressure pipeline → Hs/Tm/Tp per burst (make_waves_ds)
    Q("wave_stats_pressure",
      (s, dir) => {
        // monochromatic 8 s wave (on-bin for nfft=16) + small noise on a
        // ~10.5 m column — a physically meaningful burst, so the J&M cutoff
        // and tail logic exercise their non-degenerate paths
        val b = bursts(s, dir, 64).withColumn("pres",
          lit(10.0) + lit(0.5) * sin(lit(2.0 * math.Pi * 0.125) * col("sample")) +
            col("value") / 1000.0)
        // user wave_fcut cutoff (make_user_cutoff path): monochromatic
        // spectra hit define_cutoff's legitimate NaN branch (noise floor ≈
        // peak), exactly as the reference would; J&M auto-cutoff is covered
        // by SpectralSpec on red spectra
        Spectra.waveStatsFromPressure(b.toDF(), "burst", "sample", "pres",
          fs = 1.0, z = 0.5, nsegs = 4, fcut = Some(0.2)).toDF()
      }, None),

    // surface-track variant (make_waves_ds_elev)
    Q("wave_stats_elev",
      (s, dir) => {
        // 512-sample bursts so even the sf0.001 smoke table (1000 events)
        // yields a burst; flo = 1/(512/32) = 0.0625 Hz keeps the band valid
        val b = burstsGlobal(s, dir, 512).withColumn("elev",
          lit(0.4) * sin(lit(2.0 * math.Pi * 0.125) * col("sample")) +
            col("value") / 2000.0 - lit(0.025))
        Spectra.waveStatsFromElevation(b.toDF(), "burst", "sample", "elev",
          fs = 1.0, nsegs = 8).toDF()
      }, None),

    // per-burst elevation spectra, long format (spec["pspec"])
    Q("wave_spectra",
      (s, dir) => {
        val b = bursts(s, dir, 64).withColumn("pres",
          lit(10.0) + lit(0.5) * sin(lit(2.0 * math.Pi * 0.125) * col("sample")) +
            col("value") / 1000.0)
        Spectra.pressureSpectra(b.toDF(), "burst", "sample", "pres",
          fs = 1.0, z = 0.5, nsegs = 4, fcut = Some(0.2)).toDF()
      }, None),

    // PUV analysis per burst (puv_quick, stglib/core/waves.py:1354-1674):
    // monochromatic wave in p/u/v with linear-theory-consistent amplitudes
    Q("puv_stats",
      (s, dir) => {
        val b = burstsGlobal(s, dir, 512)
        val f0 = 0.1
        val k = graft.kernels.Spectral.qkfs(2 * math.Pi * f0, 10.0)
        val aP = 0.5 * math.cosh(k * 0.5) / math.cosh(k * 10.0)
        val aU = 0.5 * 2 * math.Pi * f0 * math.cosh(k * 1.0) / math.sinh(k * 10.0)
        val ph = col("sample") * lit(2.0 * math.Pi * f0)
        val withPuv = b
          .withColumn("p", lit(10.0) + lit(aP) * sin(ph) + col("value") / 5000.0)
          .withColumn("u", lit(aU) * sin(ph) + col("value") / 10000.0)
          .withColumn("v", lit(0.3 * aU) * sin(ph) + col("value") / 10000.0)
        Spectra.puvStats(withPuv.toDF(), "burst", "sample", "p", "u", "v",
          depth = 10.0, zp = 0.5, zuv = 1.0, fs = 1.0, fftLength = 512).toDF()
      }, None),

    // DIWASP directional spectrum per burst (DFTM + IMLM paths)
    Q("diwasp_dftm",
      (s, dir) => {
        val b = puvBursts(s, dir)
        Spectra.diwaspStats(b, "burst", "sample", "p", "u", "v",
          depth = 10.0, zp = 0.5, zuv = 1.0, fs = 1.0,
          nfft = 256, dres = 90, method = "DFTM", miter = 0,
          fmin = 0.05, fmax = 0.45).toDF()
      }, None),

    Q("diwasp_imlm",
      (s, dir) => {
        val b = puvBursts(s, dir)
        Spectra.diwaspStats(b, "burst", "sample", "p", "u", "v",
          depth = 10.0, zp = 0.5, zuv = 1.0, fs = 1.0,
          nfft = 256, dres = 90, method = "IMLM", miter = 50,
          fmin = 0.05, fmax = 0.45).toDF()
      }, None),

    // full reference pipeline variant: estimator → interpspec onto the user
    // SM grid (flo..fhi step, dres dirs) → smoothspec → infospec
    // (pyDIWASP dirspec.py:162-168, stglib/core/waves.py:15-260 grid config)
    Q("diwasp_interp",
      (s, dir) => {
        val b = puvBursts(s, dir)
        val fUser = Array.tabulate(41)(i => 0.05 + i * 0.01)
        val dUser = Array.tabulate(72)(j => -math.Pi + j * 2.0 * math.Pi / 72)
        Spectra.diwaspStats(b, "burst", "sample", "p", "u", "v",
          depth = 10.0, zp = 0.5, zuv = 1.0, fs = 1.0,
          nfft = 256, dres = 90, method = "DFTM", miter = 0,
          fmin = 0.05, fmax = 0.45, smooth = true,
          interpTo = Some((fUser, dUser))).toDF()
      }, None),

    // full directional spectrum S(freq, dir) per burst — the reference's
    // `dspec` output grid (stglib/core/waves.py:185-192), long-format
    Q("diwasp_dspec",
      (s, dir) => {
        val b = puvBursts(s, dir)
        Spectra.diwaspFullSpectrum(b, "burst", "sample", "p", "u", "v",
          depth = 10.0, zp = 0.5, zuv = 1.0, fs = 1.0,
          nfft = 128, dres = 36, method = "DFTM", miter = 0,
          fmin = 0.05, fmax = 0.45).toDF()
      }, None,
      note = "rows-only: bursts x nfreq x ndir grid; goldens in DiwaspSpec"),

    // zero-phase Butterworth low-pass per user series (filtered water level,
    // stglib/core/utils.py:1715-1756)
    Q("butter_lowpass",
      (s, dir) => {
        // filter a smooth pressure-like series (tide + wave + small noise)
        // over the WHOLE series in global (ts, event_id) order — distributed
        // overlap-save segmentation, no single task holds the series
        // (filtered water level, stglib/core/utils.py:1715-1756)
        val dfp = events(s, dir).withColumn("pres",
          lit(10.0) + lit(0.5) * sin((col("ts") / lit(4.0e10)) % lit(2.0 * math.Pi)) +
            col("value") / 500.0)
        Spectra.filtfiltWholeSeries(dfp, Seq("ts", "event_id"), "pres",
          Butterworth.lowpass(4, 0.05, 1.0), segLen = 4096).toDF()
      }, None,
      note = "rows-only: whole-series overlap-save filtfilt; equivalence in ButterworthSpec")
  )
}
