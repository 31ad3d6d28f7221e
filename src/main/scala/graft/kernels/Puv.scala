package graft.kernels

/**
 * PUV wave analysis (Madsen 1994) — pressure + horizontal velocity spectra →
 * wave height, orbital velocities, periods, and direction. Port of the
 * reference's `puv_quick` (stglib/core/waves.py:1354-1674; vectorized twin
 * :1024-1351), the largest spectral kernel in the inventory. Runs per burst
 * from ops.Spectra.
 */
object Puv {

  final case class PuvResult(
      hrmsp: Double, hrmsu: Double, ubr: Double, ubrCheck: Double,
      omegar: Double, tr: Double, tpp: Double, tpu: Double,
      phir: Double, azr: Double, ublo: Double, ubhi: Double, ubig: Double,
      hrmspTail: Double, hrmsuTail: Double, phirTail: Double, azrTail: Double,
      frequencies: Array[Double], gpp: Array[Double], guv: Array[Double],
      snp: Array[Double], snu: Array[Double])

  /** Least-squares linear detrend (scipy.signal.detrend default type). */
  def detrendLinear(x: Array[Double]): Array[Double] = {
    val n = x.length
    if (n < 2) return x.clone()
    // fit y = a + b*t over t = 0..n-1
    val tMean = (n - 1) / 2.0
    var sy = 0.0; var sty = 0.0
    var i = 0
    while (i < n) { sy += x(i); sty += (i - tMean) * x(i); i += 1 }
    val yMean = sy / n
    val stt = n.toDouble * (n.toDouble * n - 1) / 12.0 // Σ(t-tMean)²
    val b = sty / stt
    Array.tabulate(n)(i => x(i) - (yMean + b * (i - tMean)))
  }

  /** Population variance (np.var, ddof=0). */
  def popVar(x: Array[Double]): Double = {
    val m = x.sum / x.length
    x.map(v => (v - m) * (v - m)).sum / x.length
  }

  /** Pearson correlation coefficient. */
  def corr(u: Array[Double], v: Array[Double]): Double = {
    val mu = u.sum / u.length
    val mv = v.sum / v.length
    var suv = 0.0; var suu = 0.0; var svv = 0.0
    var i = 0
    while (i < u.length) {
      val du = u(i) - mu; val dv = v(i) - mv
      suv += du * dv; suu += du * du; svv += dv * dv
      i += 1
    }
    suv / math.sqrt(suu * svv)
  }

  // Σ x(i)·df over [from, until)
  private def bandSum(x: Array[Double], df: Double, from: Int, until: Int): Double = {
    var s = 0.0
    var i = math.max(from, 0)
    val end = math.min(until, x.length)
    while (i < end) { s += x(i); i += 1 }
    s * df
  }

  /**
   * puv_quick (stglib/core/waves.py:1354-1674). Inputs are raw burst series;
   * depth/zp/zuv in meters, fs in Hz.
   */
  def puvQuick(pressureRaw: Array[Double], uRaw: Array[Double], vRaw: Array[Double],
               depth: Double, zp: Double, zuv: Double, fs: Double,
               fftLength: Int = 512, rho: Double = 1025.0,
               firstFrequencyCutoff: Double = 1.0 / 50,
               infraGravityCutoff: Double = 0.05,
               lastFrequencyCutoff: Double = 1.0 / 5,
               windowType: String = "hann"): PuvResult = {
    val g = 9.81
    val p = detrendLinear(pressureRaw)
    val u = detrendLinear(uRaw)
    val v = detrendLinear(vRaw)

    val (f, gpp) = Welch.psd(p.map(_ * rho * g), fs, fftLength, windowType)
    val (_, guu) = Welch.psd(u, fs, fftLength, windowType)
    val (_, gvv) = Welch.psd(v, fs, fftLength, windowType)
    val nf = f.length
    val df = f(2) - f(1)

    val omega = f.map(2.0 * math.Pi * _)
    val k = omega.map(Spectral.qkfs(_, depth)) // k(0) = NaN at 0 Hz

    // transfer functions; index 0 (0 Hz) pinned to 1
    val hp = Array.tabulate(nf) { i =>
      if (i == 0) 1.0
      else rho * g * (math.cosh(k(i) * zp) / math.cosh(k(i) * depth))
    }
    val huv = Array.tabulate(nf) { i =>
      if (i == 0) 1.0
      else omega(i) * (math.cosh(k(i) * zuv) / math.sinh(k(i) * depth))
    }

    val guv = Array.tabulate(nf)(i => guu(i) + gvv(i))

    // np.argmax(f > cut): first index beyond the cutoff
    def firstAbove(cut: Double): Int = {
      var i = 0
      while (i < nf && f(i) <= cut) i += 1
      if (i >= nf) 0 else i
    }
    val ff = firstAbove(firstFrequencyCutoff) - 1
    val lf = firstAbove(lastFrequencyCutoff)

    val snp = Array.range(ff, lf).map(i => gpp(i) / (hp(i) * hp(i)))
    val snu = Array.range(ff, lf).map(i => guv(i) / (huv(i) * huv(i)))
    val fclip = Array.range(ff, lf).map(f)

    // f^-4 tails above the J&M cutoff (NaN tail → NaN stats)
    val kp = k.map(Spectral.transferKp(_, depth, zp))
    val (tailind, _, _, _) = Spectral.defineCutoff(f, gpp, kp)
    val snpFull = Array.tabulate(nf)(i => gpp(i) / (hp(i) * hp(i)))
    val snpTail = Spectral.makeTail(f, snpFull, tailind)
    snpTail(0) = Double.NaN

    val kpU = k.map(Spectral.transferKp(_, depth, zuv))
    val (tailindU, _, _, _) = Spectral.defineCutoff(f, guv, kpU)
    val snuFull = Array.tabulate(nf)(i => guv(i) / (huv(i) * huv(i)))
    val snuTail = Spectral.makeTail(f, snuFull, tailindU)
    snuTail(0) = Double.NaN

    val hrmsu = 2.0 * math.sqrt(2.0 * snu.sum * df)
    val hrmsp = 2.0 * math.sqrt(2.0 * snp.sum * df)
    val hrmsuTail =
      if (tailindU < 0) Double.NaN
      else 2.0 * math.sqrt(2.0 * bandSum(snuTail, df, 1, nf))
    val hrmspTail =
      if (tailind < 0) Double.NaN
      else 2.0 * math.sqrt(2.0 * bandSum(snpTail, df, 1, nf))

    val ubr = math.sqrt(2.0 * bandSum(guv, df, ff, lf))
    val ubrCheck = math.sqrt(2.0 * popVar(u) + 2.0 * popVar(v))
    val omegar = {
      var num = 0.0; var den = 0.0
      var i = ff
      while (i < lf) { num += omega(i) * guv(i) * df; den += guv(i) * df; i += 1 }
      num / den
    }
    val tr = 2.0 * math.Pi / omegar

    // the reference's guard conditions are degenerate (always false), so the
    // peak is always taken (stglib/core/waves.py:1572-1582)
    def peakPeriod(s: Array[Double]): Double = {
      var imax = 0
      var i = 1
      while (i < s.length) { if (s(i) > s(imax)) imax = i; i += 1 }
      1.0 / fclip(imax)
    }
    val tpp = peakPeriod(snp)
    val tpu = peakPeriod(snu)

    val ortest = math.signum(corr(u, v))
    val gvvBand = bandSum(gvv, df, ff, lf)
    val guuBand = bandSum(guu, df, ff, lf)
    val phir = math.atan2(ortest * gvvBand, guuBand)
    val phirTail = math.atan2(ortest * bandSum(gvv, df, 0, nf), bandSum(guu, df, 0, nf))
    val azr = 90.0 - math.toDegrees(phir)
    val azrTail = 90.0 - math.toDegrees(phirTail)

    // ig = last index with f <= cutoff
    var ig = 0
    var j = 0
    while (j < nf) { if (f(j) <= infraGravityCutoff) ig = j; j += 1 }
    val ublo = if (ff > 1) math.sqrt(2.0 * bandSum(guv, df, 1, ff)) else 0.0
    val ubig = if (ig > ff) math.sqrt(2.0 * bandSum(guv, df, ff, ig)) else 0.0
    val ubhi = if (lf < fftLength) math.sqrt(2.0 * bandSum(guv, df, lf, nf)) else 0.0

    PuvResult(hrmsp, hrmsu, ubr, ubrCheck, omegar, tr, tpp, tpu, phir, azr,
      ublo, ubhi, ubig, hrmspTail, hrmsuTail, phirTail, azrTail,
      f, gpp, guv, snp, snu)
  }

  /** Parseval check (test_variances, stglib/core/waves.py:1772-1828):
    * relative error between time-domain and spectral-band energy. */
  def varianceError(x: Array[Double], g: Array[Double], df: Double): Double = {
    val vt = popVar(x)
    val vs = g.sum * df
    math.abs((vt - vs) / vt * 100.0)
  }
}
