package graft.kernels

import org.apache.commons.math3.transform.{DftNormalization, FastFourierTransformer, TransformType}

/**
 * Welch power spectral density estimation (SURVEY §2.10) — the Spark-side
 * re-implementation of the reference's `pressure_spectra` which delegates to
 * scipy.signal.welch (stglib/core/waves.py:746-770). Pure Array[Double] code,
 * unit-testable without Spark; invoked per burst from mapGroups.
 *
 * Matches scipy.signal.welch defaults: periodic hann window, 50% overlap,
 * per-segment constant detrend (mean removal), density scaling
 * 1/(fs·Σw²), one-sided doubling except DC/Nyquist, mean over segments.
 */
object Welch {

  private val fft = new FastFourierTransformer(DftNormalization.STANDARD)

  /** next_power_of_2 (stglib/core/waves.py:1839-1844). */
  def nextPow2(x: Int): Int = {
    var p = 1
    while (p < x) p <<= 1
    p
  }

  /** Periodic (fftbins) Hann window, scipy get_window('hann', n). */
  def hann(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.5 - 0.5 * math.cos(2.0 * math.Pi * i / n))

  /** One-sided FFT frequencies for segment length n at sampling rate fs. */
  def rfftFreq(n: Int, fs: Double): Array[Double] =
    Array.tabulate(n / 2 + 1)(i => i * fs / n)

  /** |rfft|² of a real segment (length must be a power of 2). */
  private def powerSpectrum(seg: Array[Double]): Array[Double] = {
    val cx = fft.transform(seg, TransformType.FORWARD)
    Array.tabulate(seg.length / 2 + 1) { i =>
      val re = cx(i).getReal; val im = cx(i).getImaginary
      re * re + im * im
    }
  }

  /** Welch PSD. Returns (frequencies, psd); both length nperseg/2+1.
    * nperseg must be a power of 2 (callers use nextPow2(nsamps/nsegs)).
    * window: "hann" (default) or "boxcar" (used by the reference's Parseval
    * variance-preservation test, test_puv_quick). */
  def psd(x: Array[Double], fs: Double, nperseg: Int,
          window: String = "hann"): (Array[Double], Array[Double]) = {
    val n = x.length
    val np = math.min(nperseg, n)
    val win = if (window == "boxcar") Array.fill(np)(1.0) else hann(np)
    val winSumSq = win.map(w => w * w).sum
    val scale = 1.0 / (fs * winSumSq)
    val step = np - np / 2 // 50% overlap
    val nseg = (n - np) / step + 1
    val acc = new Array[Double](np / 2 + 1)
    var s = 0
    while (s < nseg) {
      val off = s * step
      // constant detrend: remove segment mean
      var mean = 0.0
      var i = 0
      while (i < np) { mean += x(off + i); i += 1 }
      mean /= np
      val seg = new Array[Double](np)
      i = 0
      while (i < np) { seg(i) = (x(off + i) - mean) * win(i); i += 1 }
      val p = powerSpectrum(seg)
      i = 0
      while (i <= np / 2) { acc(i) += p(i); i += 1 }
      s += 1
    }
    val psd = new Array[Double](np / 2 + 1)
    var i = 0
    while (i <= np / 2) {
      // one-sided: double everything except DC and Nyquist
      val mult = if (i == 0 || i == np / 2) 1.0 else 2.0
      psd(i) = acc(i) / nseg * scale * mult
      i += 1
    }
    (rfftFreq(np, fs), psd)
  }
}
