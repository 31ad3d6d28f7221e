package graft.kernels

/**
 * Scalar-array spectral pipeline (SURVEY §2.10): dispersion, transfer
 * function, Jones & Monismith cutoff, f⁻⁴ tail, spectral moments, and the
 * wave statistics Hs/Tm/Tp — the per-burst kernel behind `make_waves_ds`
 * (stglib/core/waves.py:571-681). Pure Scala, no Spark imports.
 */
object Spectral {

  /** Wavenumber via Wiberg & Sherwood 3-iteration Newton solve
    * (stglib/core/waves.py:988-1007); scalar twin of Physics.qkfs. */
  def qkfs(omega: Double, h: Double): Double = {
    val g = 9.81
    val x = omega * omega * h / g
    var y = if (x < 1.0) math.sqrt(x) else x
    var it = 0
    while (it < 3) {
      val t = math.tanh(y)
      y = y - ((y * t - x) / (t + y * (1.0 - t * t)))
      it += 1
    }
    y / h
  }

  /** Pressure transfer function Kp = cosh(kz)/cosh(kh); NaN k (0 freq) → 1
    * (stglib/core/waves.py:778-803). */
  def transferKp(k: Double, h: Double, z: Double): Double =
    if (k.isNaN) 1.0 else math.cosh(k * z) / math.cosh(k * h)

  /** Jones & Monismith (2007) cutoff selection (stglib/core/waves.py:806-864).
    * Returns (tailind, noisecutind, fpeakcutind, kpcutind); tailind = -1
    * encodes the reference's NaN (no valid tail → all-NaN spectrum). */
  def defineCutoff(f: Array[Double], pxx: Array[Double], kp: Array[Double],
                   noise: Double = 0.9): (Int, Int, Int, Int) = {
    val n = f.length
    val noiseFloor = {
      val thr = noise * f(n - 1)
      var s = 0.0; var c = 0
      var i = 0
      while (i < n) { if (f(i) >= thr) { s += pxx(i); c += 1 }; i += 1 }
      12.0 * (s / c)
    }
    var noisecutind = 0
    var i = 0
    while (i < n) { if (pxx(i) > noiseFloor) noisecutind = i; i += 1 }
    // argmax of Pxx (first max, like np.argmax)
    var imax = 0
    i = 1
    while (i < n) { if (pxx(i) > pxx(imax)) imax = i; i += 1 }
    val fpeakcut = 1.1 * f(imax)
    // np.searchsorted(f, fpeakcut): left insertion point
    var fpeakcutind = 0
    while (fpeakcutind < n && f(fpeakcutind) < fpeakcut) fpeakcutind += 1
    // last index with Kp > 0.1, +1; 0 if none
    var kpcutind = 0
    i = 0
    while (i < n) { if (kp(i) > 0.1) kpcutind = i + 1; i += 1 }
    val tailind =
      if (noisecutind > fpeakcutind && noisecutind <= kpcutind) noisecutind
      else if (noisecutind > fpeakcutind && noisecutind > kpcutind) kpcutind
      else -1
    (tailind, noisecutind, fpeakcutind, kpcutind)
  }

  /** User-specified cutoff override (stglib/core/waves.py:2117-2152):
    * fcut → first index with f >= fcut; else Kpmin (clamped to [0.1, 0.6]) →
    * last index with Kp > Kpmin, +1. */
  def userCutoff(f: Array[Double], kp: Array[Double],
                 fcut: Option[Double], kpmin: Option[Double]): Int =
    fcut match {
      case Some(fc) =>
        var i = 0
        while (i < f.length && f(i) < fc) i += 1
        i
      case None =>
        val km = math.max(0.1, math.min(0.6, kpmin.getOrElse(0.1)))
        var last = 0
        var i = 0
        while (i < kp.length) { if (kp(i) > km) last = i + 1; i += 1 }
        last
    }

  /** f⁻⁴ tail above tailind (stglib/core/waves.py:867-898); tailind = -1 →
    * all-NaN spectrum (reference NaN branch). */
  def makeTail(f: Array[Double], pnn: Array[Double], tailind: Int): Array[Double] = {
    if (tailind < 0) return Array.fill(f.length)(Double.NaN)
    val out = pnn.clone()
    val ft = f(tailind)
    val pt = pnn(tailind)
    var i = tailind
    while (i < f.length) {
      val r = f(i) / ft
      out(i) = pt / (r * r * r * r)
      i += 1
    }
    out
  }

  /** nth spectral moment: trapezoidal ∫ Pnn·fⁿ df (stglib/core/waves.py:936-938). */
  def moment(f: Array[Double], pnn: Array[Double], n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < f.length - 1) {
      val y0 = pnn(i) * math.pow(f(i), n)
      val y1 = pnn(i + 1) * math.pow(f(i + 1), n)
      s += 0.5 * (y0 + y1) * (f(i + 1) - f(i))
      i += 1
    }
    s
  }

  def hs(m0: Double): Double = 4.0 * math.sqrt(m0)
  def tm(m0: Double, m2: Double): Double = math.sqrt(m0 / m2)

  /** Peak period 1/fp; fp at index 0 → NaN (stglib/core/waves.py:951-961).
    * NaNs in the spectrum are treated as 0 for the argmax (fillna(0)). */
  def tp(f: Array[Double], pnn: Array[Double]): Double = {
    var imax = 0
    var i = 1
    while (i < pnn.length) {
      val v = if (pnn(i).isNaN) 0.0 else pnn(i)
      val m = if (pnn(imax).isNaN) 0.0 else pnn(imax)
      if (v > m) imax = i
      i += 1
    }
    if (imax == 0) Double.NaN else 1.0 / f(imax)
  }

  /** Burst NaN repair (var_wave_burst_fill_nans,
    * stglib/core/waves.py:1992-2034): when < 10% of samples are NaN, fill
    * each from the nearest valid sample within tolSamples; otherwise leave
    * as-is (stats go NaN downstream). */
  def fillNaNsNearest(x: Array[Double], tolSamples: Int): Array[Double] = {
    val n = x.length
    var nans = 0
    var i = 0
    while (i < n) { if (x(i).isNaN) nans += 1; i += 1 }
    if (nans == 0 || nans >= n * 0.1) return x
    val valid = x.indices.filter(i => !x(i).isNaN).toArray
    val out = x.clone()
    i = 0
    while (i < n) {
      if (out(i).isNaN) {
        // nearest valid index within tolerance; ties to the earlier one
        var best = -1
        var bestDist = Int.MaxValue
        var j = 0
        while (j < valid.length) {
          val d = math.abs(valid(j) - i)
          if (d < bestDist) { bestDist = d; best = valid(j) }
          j += 1
        }
        if (best >= 0 && bestDist <= tolSamples) out(i) = x(best)
      }
      i += 1
    }
    out
  }

  /** Full per-burst pressure→wave-statistics kernel (make_waves_ds,
    * stglib/core/waves.py:571-681). Input: burst pressure samples (dbar),
    * sampling rate fs, sensor height z. */
  final case class WaveStats(
      h: Double, tailind: Int, m0: Double, m2: Double,
      wh4061: Double, wp4060: Double, wpPeak: Double,
      frequencies: Array[Double], pspec: Array[Double])

  def waveStatsFromPressure(p0: Array[Double], fs: Double, z: Double,
                            nsegs: Int = 16, noise: Double = 0.9,
                            fcut: Option[Double] = None,
                            kpmin: Option[Double] = None,
                            nanTolSamples: Int = 2): WaveStats = {
    val p = fillNaNsNearest(p0, nanTolSamples)
    val nfft = Welch.nextPow2(p.length / nsegs)
    val (f, pxx) = Welch.psd(p, fs, nfft)
    val h = p.sum / p.length + z
    val k = f.map(fi => qkfs(2.0 * math.Pi * fi, h))
    // 0-frequency: omega=0 → x=0 → k=0; reference gets NaN (0/0) and maps
    // Kp→1; our qkfs(0) returns 0 numerically (tanh Newton from 0), Kp(0)=1.
    val kp = k.map(ki => transferKp(ki, h, z))
    val pnn = Array.tabulate(f.length)(i => pxx(i) / (kp(i) * kp(i)))
    val tailind =
      if (fcut.isDefined || kpmin.isDefined) userCutoff(f, kp, fcut, kpmin)
      else defineCutoff(f, pxx, kp, noise)._1
    val pspec = makeTail(f, pnn, tailind)
    val m0v = moment(f, pspec, 0)
    val m2v = moment(f, pspec, 2)
    WaveStats(h, tailind, m0v, m2v, hs(m0v), tm(m0v, m2v), tp(f, pspec), f, pspec)
  }

  /** Surface-track variant (make_waves_ds_elev, stglib/core/waves.py:684-743):
    * band-limit [flo, fhi], no transfer function, no cutoff/tail. */
  def waveStatsFromElevation(e: Array[Double], fs: Double,
                             nsegs: Int = 16): WaveStats = {
    val nsamps = e.length
    val nfft = Welch.nextPow2(nsamps / nsegs)
    val (f0, pxx0) = Welch.psd(e, fs, nfft)
    val flo = math.rint(1.0 / (nsamps / fs / 32.0) * 1000) / 1000
    val fhi = math.min(2.0, fs / 2.0)
    val keep = f0.indices.filter(i => f0(i) >= flo && f0(i) <= fhi).toArray
    val f = keep.map(f0)
    val pnn = keep.map(pxx0)
    val m0v = moment(f, pnn, 0)
    val m2v = moment(f, pnn, 2)
    WaveStats(Double.NaN, -1, m0v, m2v, hs(m0v), tm(m0v, m2v), tp(f, pnn), f, pnn)
  }
}
