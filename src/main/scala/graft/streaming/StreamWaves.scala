package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

/**
 * LIVE wave statistics: streaming burst assembly → per-closed-burst
 * Welch pressure spectra → Hs/Tm/Tp — the streaming twin of the batch
 * `wave_stats_pressure` chain (make_waves_ds, stglib/core/waves.py:
 * 571-681), for a live mooring feed instead of a recovered deployment
 * file. The reference computes waves only in post-processing batch;
 * this is the natural Structured Streaming extension the repo's §2.11
 * surface documents.
 *
 * Shape: [[BurstAssembler.assemble]] holds at most nsamps−1 samples per
 * series in state (bounded) and emits one row per COMPLETED burst; the
 * spectral kernel then runs as a stateless map on those closed bursts —
 * the exact same `kernels/Spectral.waveStatsFromPressure` code path the
 * batch operator and its DuckDB-gated oracles exercise, so streaming
 * results are bit-identical to the batch run by construction (proven in
 * StreamWavesSpec across trigger boundaries).
 */
object StreamWaves {

  final case class LiveWaveStats(series: Long, burst: Long, startTs: Long,
                                 water_depth: Double, wh_4061: Double,
                                 wp_4060: Double, wp_peak: Double,
                                 m0: Double, m2: Double)

  /** Pressure samples in → one statistics row per completed burst out.
    * Works identically on a static Dataset (batch parity). */
  def fromPressure(ds: Dataset[BurstAssembler.Sample], nsamps: Int,
                   fs: Double, z: Double, nsegs: Int = 16,
                   fcut: Option[Double] = None): Dataset[LiveWaveStats] = {
    implicit val enc = Encoders.product[LiveWaveStats]
    BurstAssembler.assemble(ds, nsamps).map { b =>
      val w = graft.kernels.Spectral.waveStatsFromPressure(
        b.values, fs, z, nsegs, fcut = fcut)
      LiveWaveStats(b.series, b.burst, b.startTs,
        w.h, w.wh4061, w.wp4060, w.wpPeak, w.m0, w.m2)
    }
  }
}
