package graft.ops

import graft.kernels.{Butterworth, Spectral}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Spark wiring for the per-burst signal kernels (SURVEY §2.10/§2.12):
 * `groupByKey(burst).mapGroups(kernel)` — the same fan-out point where the
 * reference used one dask future per burst (stglib/core/waves.py:263-306),
 * but distributed by Spark's scheduler for every kernel, not just DIWASP.
 *
 * Scale: burst groups are small (≤4096 samples × few vars), so per-group
 * state is bounded; the shuffle keys on burst id, and skew is impossible by
 * construction (all bursts equal size). Sample order is restored inside the
 * group (Spark guarantees no intra-group order), matching SURVEY §7.5 risk 7.
 */
object Spectra {

  final case class WaveStatsRow(
      burst: Long, h: Double, wh_4061: Double, wp_4060: Double,
      wp_peak: Double, m0: Double, m2: Double, tailind: Int)

  /** make_waves_ds over long-format (burst, sample, pressure) rows. */
  def waveStatsFromPressure(df: DataFrame, burstCol: String, sampleCol: String,
                            presCol: String, fs: Double, z: Double,
                            nsegs: Int = 16, noise: Double = 0.9,
                            fcut: Option[Double] = None,
                            kpmin: Option[Double] = None): Dataset[WaveStatsRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(burstCol).cast("long"), col(sampleCol).cast("long"),
        coalesce(col(presCol).cast("double"), lit(Double.NaN)))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val p = it.toArray.sortBy(_._2).map(_._3)
        val w = Spectral.waveStatsFromPressure(p, fs, z, nsegs, noise, fcut, kpmin)
        WaveStatsRow(k, w.h, w.wh4061, w.wp4060, w.wpPeak, w.m0, w.m2, w.tailind)
      }
  }

  /** make_waves_ds_elev over long-format (burst, sample, elevation) rows. */
  def waveStatsFromElevation(df: DataFrame, burstCol: String, sampleCol: String,
                             elevCol: String, fs: Double,
                             nsegs: Int = 16): Dataset[WaveStatsRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(burstCol).cast("long"), col(sampleCol).cast("long"),
        coalesce(col(elevCol).cast("double"), lit(Double.NaN)))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val e = it.toArray.sortBy(_._2).map(_._3)
        val w = Spectral.waveStatsFromElevation(e, fs, nsegs)
        WaveStatsRow(k, w.h, w.wh4061, w.wp4060, w.wpPeak, w.m0, w.m2, w.tailind)
      }
  }

  final case class SpectrumRow(burst: Long, frequency: Double, pspec: Double)

  /** Per-burst elevation spectrum, exploded to (burst, frequency, pspec)
    * rows — the long-format twin of spec["pspec"]. */
  def pressureSpectra(df: DataFrame, burstCol: String, sampleCol: String,
                      presCol: String, fs: Double, z: Double,
                      nsegs: Int = 16,
                      fcut: Option[Double] = None,
                      kpmin: Option[Double] = None): Dataset[SpectrumRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(burstCol).cast("long"), col(sampleCol).cast("long"),
        coalesce(col(presCol).cast("double"), lit(Double.NaN)))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val p = it.toArray.sortBy(_._2).map(_._3)
        val w = Spectral.waveStatsFromPressure(p, fs, z, nsegs, fcut = fcut, kpmin = kpmin)
        w.frequencies.indices.iterator.map(i =>
          SpectrumRow(k, w.frequencies(i), w.pspec(i)))
      }
  }

  final case class PuvRow(
      burst: Long, hrmsp: Double, hrmsu: Double, ubr: Double, omegar: Double,
      tr: Double, tpp: Double, tpu: Double, phir: Double, azr: Double,
      ublo: Double, ubhi: Double, ubig: Double,
      hrmsp_tail: Double, hrmsu_tail: Double)

  /** puv_quick per burst over long-format (burst, sample, p, u, v) rows
    * (call_puv_quick_vectorized, stglib/core/waves.py:1847-1989). */
  def puvStats(df: DataFrame, burstCol: String, sampleCol: String,
               pCol: String, uCol: String, vCol: String,
               depth: Double, zp: Double, zuv: Double, fs: Double,
               fftLength: Int = 512): Dataset[PuvRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(burstCol).cast("long"), col(sampleCol).cast("long"),
        coalesce(col(pCol).cast("double"), lit(Double.NaN)),
        coalesce(col(uCol).cast("double"), lit(Double.NaN)),
        coalesce(col(vCol).cast("double"), lit(Double.NaN)))
      .as[(Long, Long, Double, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2)
        val r = graft.kernels.Puv.puvQuick(
          rows.map(_._3), rows.map(_._4), rows.map(_._5),
          depth, zp, zuv, fs, fftLength)
        PuvRow(k, r.hrmsp, r.hrmsu, r.ubr, r.omegar, r.tr, r.tpp, r.tpu,
          r.phir, r.azr, r.ublo, r.ubhi, r.ubig, r.hrmspTail, r.hrmsuTail)
      }
  }

  final case class DirSpecRow(
      burst: Long, hs: Double, tp: Double, dtp: Double, dp: Double,
      nfreq: Int, ndir: Int)

  /** DIWASP directional spectrum per burst over (burst, sample, p, u, v)
    * rows (make_diwasp_ds + call_diwasp_mp, stglib/core/waves.py:15-306).
    * One mapGroups task per burst = the reference's dask fan-out, on Spark. */
  def diwaspStats(df: DataFrame, burstCol: String, sampleCol: String,
                  pCol: String, uCol: String, vCol: String,
                  depth: Double, zp: Double, zuv: Double, fs: Double,
                  nfft: Int, dres: Int, method: String, miter: Int,
                  fmin: Double, fmax: Double): Dataset[DirSpecRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(burstCol).cast("long"), col(sampleCol).cast("long"),
        coalesce(col(pCol).cast("double"), lit(Double.NaN)),
        coalesce(col(uCol).cast("double"), lit(Double.NaN)),
        coalesce(col(vCol).cast("double"), lit(Double.NaN)))
      .as[(Long, Long, Double, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2)
        val d = graft.kernels.Diwasp.dirspec(
          Array(rows.map(_._3), rows.map(_._4), rows.map(_._5)),
          Array("pres", "velx", "vely"),
          Array(Array(0.0, 0.0, 0.0), Array(0.0, 0.0, 0.0), Array(zp, zuv, zuv)),
          depth, fs, nfft, dres, method, miter, fmin, fmax)
        DirSpecRow(k, d.hs, d.tp, d.dtp, d.dp, d.freqs.length, d.dirs.length)
      }
  }

  final case class FiltRow(series: Long, sample: Long, value_filt: Double)

  /** Zero-phase Butterworth filtering per series/burst/bin group
    * (apply_butter_filt, stglib/core/filter.py:60-153). */
  def filtfiltPerGroup(df: DataFrame, groupCol: String, sampleCol: String,
                       valueCol: String, sos: Array[Butterworth.Sos]): Dataset[FiltRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("long"), col(sampleCol).cast("long"),
        coalesce(col(valueCol).cast("double"), lit(Double.NaN)))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2)
        val y = Butterworth.filtfilt(sos, rows.map(_._3))
        rows.indices.iterator.map(i => FiltRow(k, rows(i)._2, y(i)))
      }
  }
}
