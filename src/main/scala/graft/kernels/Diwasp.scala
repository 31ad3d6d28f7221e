package graft.kernels

import org.apache.commons.math3.transform.{DftNormalization, FastFourierTransformer, TransformType}

/**
 * DIWASP directional wave spectrum estimation (Hashimoto 1997), ported from
 * the reference's pyDIWASP vendored library:
 *  - cross-power spectra: stglib/lib/pyDIWASP/private/diwasp_csd.py (scipy
 *    csd, hamming window, no overlap, no detrend)
 *  - wavenumber: private/wavenumber.py (Dalrymple iteration)
 *  - transfer parameters per datatype: private/{elev,pres,velx,vely}.py
 *  - estimators: private/DFTM.py (direct) and private/IMLM.py (iterative,
 *    default iter=50)
 *  - statistics: infospec.py (Hs, Tp, DTp, Dp)
 *
 * Per-burst kernel: inputs are ≤3 sensor series (e.g. p/u/v), outputs the
 * directional spectrum S(freq, dir) plus summary stats. Distribution across
 * bursts happens in ops.Spectra (groupByKey.mapGroups) — the point where the
 * reference fanned out one dask future per burst (stglib/core/waves.py:263-306).
 */
object Diwasp {

  // ---- minimal complex arithmetic ------------------------------------
  final case class C(re: Double, im: Double) {
    def +(o: C) = C(re + o.re, im + o.im)
    def -(o: C) = C(re - o.re, im - o.im)
    def *(o: C) = C(re * o.re - im * o.im, re * o.im + im * o.re)
    def /(o: C) = {
      val d = o.re * o.re + o.im * o.im
      C((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
    }
    def *(s: Double) = C(re * s, im * s)
    def conj = C(re, -im)
  }
  object C { val zero = C(0, 0); val one = C(1, 0) }

  /** Gauss-Jordan inverse of a small complex matrix (szd ≤ 3). */
  def inv(a: Array[Array[C]]): Array[Array[C]] = {
    val n = a.length
    val m = Array.tabulate(n, 2 * n)((i, j) =>
      if (j < n) a(i)(j) else if (j - n == i) C.one else C.zero)
    var col = 0
    while (col < n) {
      // partial pivot by magnitude
      var piv = col
      var best = 0.0
      var r = col
      while (r < n) {
        val mag = m(r)(col).re * m(r)(col).re + m(r)(col).im * m(r)(col).im
        if (mag > best) { best = mag; piv = r }
        r += 1
      }
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val d = m(col)(col)
      var j = 0
      while (j < 2 * n) { m(col)(j) = m(col)(j) / d; j += 1 }
      r = 0
      while (r < n) {
        if (r != col) {
          val f = m(r)(col)
          j = 0
          while (j < 2 * n) { m(r)(j) = m(r)(j) - f * m(col)(j); j += 1 }
        }
        r += 1
      }
      col += 1
    }
    Array.tabulate(n, n)((i, j) => m(i)(j + n))
  }

  // ---- cross-power spectral density ----------------------------------
  private val fft = new FastFourierTransformer(DftNormalization.STANDARD)

  /** Periodic Hamming window (scipy get_window('hamming', n)). */
  def hamming(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.54 - 0.46 * math.cos(2.0 * math.Pi * i / n))

  /** scipy.signal.csd with window='hamming', noverlap=0, detrend=False:
    * one-sided complex cross-spectrum, length nfft/2+1.
    * Pxy = mean over segments of conj(X)·Y · scale. */
  def csd(x: Array[Double], y: Array[Double], nfft: Int, fs: Double): Array[C] = {
    val win = hamming(nfft)
    val winSumSq = win.map(w => w * w).sum
    val scale = 1.0 / (fs * winSumSq)
    val nseg = x.length / nfft
    val acc = Array.fill(nfft / 2 + 1)(C.zero)
    var s = 0
    while (s < nseg) {
      val off = s * nfft
      val xs = Array.tabulate(nfft)(i => x(off + i) * win(i))
      val ys = Array.tabulate(nfft)(i => y(off + i) * win(i))
      val fx = fft.transform(xs, TransformType.FORWARD)
      val fy = fft.transform(ys, TransformType.FORWARD)
      var i = 0
      while (i <= nfft / 2) {
        val cx = C(fx(i).getReal, fx(i).getImaginary).conj
        val cy = C(fy(i).getReal, fy(i).getImaginary)
        acc(i) = acc(i) + cx * cy
        i += 1
      }
      s += 1
    }
    Array.tabulate(nfft / 2 + 1) { i =>
      val mult = if (i == 0 || i == nfft / 2) 1.0 else 2.0
      acc(i) * (scale * mult / nseg)
    }
  }

  /** Dalrymple iterative wavenumber (pyDIWASP private/wavenumber.py). */
  def wavenumber(sigma: Double, h: Double): Double = {
    val g = 9.81
    val a0 = sigma * sigma * h / g
    if (a0 == 0.0) return 0.0
    val b1 = 1.0 / math.tanh(math.pow(a0, 0.75))
    var a1 = a0 * math.pow(b1, 0.666)
    var da1 = 1000.0
    while (math.abs(da1 / a1) > 1e-8) {
      val th = math.tanh(a1)
      val ch = math.cosh(a1)
      val f1 = a0 - a1 * th
      val f2 = -a1 / (ch * ch) - th
      da1 = -f1 / f2
      a1 += da1
    }
    a1 / h
  }

  // ---- transfer parameters per datatype ------------------------------
  /** trm(freq)(dir) for a sensor type at height z (private/{elev,pres,velx,vely}.py). */
  def transferMatrix(datatype: String, omega: Array[Double], dirs: Array[Double],
                     wns: Array[Double], z: Double, depth: Double): Array[Array[Double]] =
    datatype match {
      case "elev" => Array.fill(omega.length, dirs.length)(1.0)
      case "pres" =>
        Array.tabulate(omega.length, dirs.length) { (i, _) =>
          val kz = math.cosh(z * wns(i)) / math.cosh(depth * wns(i))
          math.max(kz, 0.1)
        }
      case "velx" =>
        Array.tabulate(omega.length, dirs.length) { (i, j) =>
          val kz = math.max(math.cosh(z * wns(i)) / math.sinh(depth * wns(i)), 0.1)
          omega(i) * kz * math.cos(dirs(j))
        }
      case "vely" =>
        Array.tabulate(omega.length, dirs.length) { (i, j) =>
          val kz = math.max(math.cosh(z * wns(i)) / math.sinh(depth * wns(i)), 0.1)
          omega(i) * kz * math.sin(dirs(j))
        }
      case other => throw new IllegalArgumentException(s"unknown datatype $other")
    }

  // ---- estimators ----------------------------------------------------
  /** DFTM direct Fourier transform method (private/DFTM.py). Primitive
    * re/im accumulation — boxed complex ops dominated the per-burst cost. */
  def dftm(xps: Array[Array[Array[C]]], trm: Array[Array[Array[Double]]],
           kx: Array[Array[Array[Array[Double]]]], ss: Array[Array[C]],
           ddirs: Int): Array[Array[Double]] = {
    val szd = xps.length
    val nf = xps(0)(0).length
    val ddir = 2.0 * math.Pi / ddirs
    Array.tabulate(nf) { ff =>
      val sfRe = new Array[Double](ddirs)
      val sfIm = new Array[Double](ddirs)
      var m = 0
      while (m < szd) {
        var n = 0
        while (n < szd) {
          val x = xps(m)(n)(ff)
          val kxr = kx(m)(n)(ff)
          val tn = trm(n)(ff); val tm = trm(m)(ff)
          var d = 0
          while (d < ddirs) {
            val h = tn(d) * tm(d) // real transfer product
            val er = math.cos(kxr(d)); val ei = math.sin(kxr(d))
            // t = x·h·e; accumulate conj(t)
            val tr = (x.re * er - x.im * ei) * h
            val ti = (x.re * ei + x.im * er) * h
            sfRe(d) += tr
            sfIm(d) -= ti
            d += 1
          }
          n += 1
        }
        m += 1
      }
      var sr = 0.0; var si = 0.0
      var d = 0
      while (d < ddirs) { sr += sfRe(d); si += sfIm(d); d += 1 }
      sr *= ddir; si *= ddir
      val den = sr * sr + si * si
      val scale = ss(0)(ff)
      Array.tabulate(ddirs) { d =>
        // e = conj(sf)/sum; out = (scale·e).re
        val cr = sfRe(d); val ci = -sfIm(d)
        val er = (cr * sr + ci * si) / den
        val ei = (ci * sr - cr * si) / den
        scale.re * er - scale.im * ei
      }
    }
  }

  /** IMLM iterated maximum-likelihood method (private/IMLM.py);
    * gamma=0.1, alpha=0.1 fixed as in the reference. Hot loops use primitive
    * re/im arrays — the boxed-complex formulation allocated one object per
    * arithmetic op and dominated the whole benchmark. */
  def imlm(xps: Array[Array[Array[C]]], trm: Array[Array[Array[Double]]],
           kx: Array[Array[Array[Array[Double]]]], ss: Array[Array[C]],
           ddirs: Int, miter: Int): Array[Array[Double]] = {
    val gamma = 0.1
    val alpha = 0.1
    val szd = xps.length
    val nf = xps(0)(0).length
    val ddir = 2.0 * math.Pi / ddirs
    val sz2 = szd * szd

    Array.tabulate(nf) { ff =>
      // flat (m*szd+n)*ddirs+d layout; iH is the conjugate of H
      val hRe = new Array[Double](sz2 * ddirs)
      val hIm = new Array[Double](sz2 * ddirs)
      var m = 0
      while (m < szd) {
        var n = 0
        while (n < szd) {
          val base = (m * szd + n) * ddirs
          var d = 0
          while (d < ddirs) {
            val h = trm(n)(ff)(d) * trm(m)(ff)(d)
            val ang = kx(m)(n)(ff)(d)
            hRe(base + d) = h * math.cos(ang)
            hIm(base + d) = h * math.sin(ang)
            d += 1
          }
          n += 1
        }
        m += 1
      }

      val eRe = new Array[Double](ddirs); val eIm = new Array[Double](ddirs)
      val tRe = new Array[Double](ddirs); val tIm = new Array[Double](ddirs)
      val toRe = new Array[Double](ddirs); val toIm = new Array[Double](ddirs)
      val eoRe = new Array[Double](ddirs); val eoIm = new Array[Double](ddirs)
      val sfRe = new Array[Double](ddirs); val sfIm = new Array[Double](ddirs)

      // sf = Σ_{m,n} invcps(m,n)·H(m,n,·); then out = 1/sf
      def mlEstimate(invcps: Array[Array[C]], outRe: Array[Double],
                     outIm: Array[Double]): Unit = {
        java.util.Arrays.fill(sfRe, 0.0); java.util.Arrays.fill(sfIm, 0.0)
        var mm = 0
        while (mm < szd) {
          var nn = 0
          while (nn < szd) {
            val ic = invcps(mm)(nn)
            val base = (mm * szd + nn) * ddirs
            var d = 0
            while (d < ddirs) {
              val hr = hRe(base + d); val hi = hIm(base + d)
              sfRe(d) += ic.re * hr - ic.im * hi
              sfIm(d) += ic.re * hi + ic.im * hr
              d += 1
            }
            nn += 1
          }
          mm += 1
        }
        var d = 0
        while (d < ddirs) {
          val den = sfRe(d) * sfRe(d) + sfIm(d) * sfIm(d)
          outRe(d) = sfRe(d) / den
          outIm(d) = -sfIm(d) / den
          d += 1
        }
      }

      // x *= 1/(ddir·Σx) (complex kappa)
      def normalize(xRe: Array[Double], xIm: Array[Double]): Unit = {
        var sr = 0.0; var si = 0.0
        var d = 0
        while (d < ddirs) { sr += xRe(d); si += xIm(d); d += 1 }
        sr *= ddir; si *= ddir
        val den = sr * sr + si * si
        val kr = sr / den; val ki = -si / den
        d = 0
        while (d < ddirs) {
          val r = xRe(d) * kr - xIm(d) * ki
          val i = xRe(d) * ki + xIm(d) * kr
          xRe(d) = r; xIm(d) = i
          d += 1
        }
      }

      val cps = Array.tabulate(szd, szd)((i, j) => xps(i)(j)(ff))
      mlEstimate(inv(cps), eoRe, eoIm)
      normalize(eoRe, eoIm)
      System.arraycopy(eoRe, 0, eRe, 0, ddirs); System.arraycopy(eoIm, 0, eIm, 0, ddirs)
      System.arraycopy(eoRe, 0, tRe, 0, ddirs); System.arraycopy(eoIm, 0, tIm, 0, ddirs)

      val ixps = Array.ofDim[C](szd, szd)
      var it = 0
      while (it < miter) {
        // forward-model cross spectra: ixps(m,n) = ddir·Σ_d conj(H)·E
        var mm = 0
        while (mm < szd) {
          var nn = 0
          while (nn < szd) {
            val base = (mm * szd + nn) * ddirs
            var sr = 0.0; var si = 0.0
            var d = 0
            while (d < ddirs) {
              val hr = hRe(base + d); val hi = -hIm(base + d) // conj(H)
              sr += hr * eRe(d) - hi * eIm(d)
              si += hr * eIm(d) + hi * eRe(d)
              d += 1
            }
            ixps(mm)(nn) = C(sr * ddir, si * ddir)
            nn += 1
          }
          mm += 1
        }
        System.arraycopy(tRe, 0, toRe, 0, ddirs); System.arraycopy(tIm, 0, toIm, 0, ddirs)
        mlEstimate(inv(ixps), tRe, tIm)
        normalize(tRe, tIm)
        var d = 0
        while (d < ddirs) {
          eRe(d) += gamma * ((eoRe(d) - tRe(d)) + alpha * (tRe(d) - toRe(d)))
          eIm(d) += gamma * ((eoIm(d) - tIm(d)) + alpha * (tIm(d) - toIm(d)))
          d += 1
        }
        normalize(eRe, eIm)
        it += 1
      }
      val scale = ss(0)(ff)
      // (scale · conj(E)).re
      Array.tabulate(ddirs)(d => scale.re * eRe(d) + scale.im * eIm(d))
    }
  }

  // ---- top-level per-burst estimation --------------------------------
  final case class DirSpec(
      freqs: Array[Double], dirs: Array[Double], s: Array[Array[Double]],
      hs: Double, tp: Double, dtp: Double, dp: Double)

  /** smoothspec (pyDIWASP private/smoothspec.py, kernel [[1,.5,.25],[1,.5,.25]]
    * as dirspec.py:168 passes): 5-point frequency + 5-point direction
    * weighted average over the interior [2, n-2) region, NaN→0 first.
    * Exact port (including the non-circular direction edges). */
  def smoothSpec(sIn: Array[Array[Double]]): Array[Array[Double]] = {
    val (f1, f2, f3, d1, d2, d3) = (0.25, 0.5, 1.0, 0.25, 0.5, 1.0)
    val tot = 2 * f1 + 2 * f2 + f3 + 2 * d1 + 2 * d2 + d3
    val nf = sIn.length
    val nd = if (nf > 0) sIn(0).length else 0
    val z = sIn.map(_.map(v => if (v.isNaN) 0.0 else v))
    val out = z.map(_.clone())
    var i = 2
    while (i < nf - 2) {
      var j = 2
      while (j < nd - 2) {
        out(i)(j) = (f1 * z(i - 2)(j) + f2 * z(i - 1)(j) + f3 * z(i)(j) +
          f2 * z(i + 1)(j) + f1 * z(i + 2)(j) +
          d1 * z(i)(j - 2) + d2 * z(i)(j - 1) + d3 * z(i)(j) +
          d2 * z(i)(j + 1) + d1 * z(i)(j + 2)) / tot
        j += 1
      }
      i += 1
    }
    out
  }

  /** interpspec (pyDIWASP interpspec.py): resample a directional spectrum
    * onto a user (freq, dir) grid. Documented deviation: the reference runs
    * scipy griddata (Delaunay linear interpolation in (f·sinθ, f·cosθ)
    * space); for the polar-regular grids both sides use, separable bilinear
    * interpolation in (f, θ) — with circular direction wrap and 0 outside
    * the frequency range (griddata's NaN→0) — is the same reconstruction up
    * to triangulation diagonal choice. Same-unit grids, so the spectobasis
    * scale factors cancel. */
  def interpSpec(fIn: Array[Double], dIn: Array[Double], s: Array[Array[Double]],
                 fOut: Array[Double], dOut: Array[Double]): Array[Array[Double]] = {
    val nd = dIn.length
    val twoPi = 2.0 * math.Pi
    Array.tabulate(fOut.length, dOut.length) { (i, j) =>
      val fq = fOut(i)
      if (fq < fIn.head || fq > fIn.last) 0.0
      else {
        val fi = java.util.Arrays.binarySearch(fIn, fq)
        val (i0, i1, wf) = if (fi >= 0) (fi, fi, 0.0) else {
          val ins = -fi - 1
          val lo = math.max(0, ins - 1)
          val hi = math.min(fIn.length - 1, ins)
          (lo, hi, if (hi == lo) 0.0 else (fq - fIn(lo)) / (fIn(hi) - fIn(lo)))
        }
        // circular direction coordinate on the dIn grid
        val dd = dIn(1) - dIn(0)
        var x = (dOut(j) - dIn(0)) / dd
        x -= math.floor(x / nd) * nd // wrap into [0, nd)
        val j0 = x.toInt % nd
        val j1 = (j0 + 1) % nd
        val wd = x - math.floor(x)
        def bil(r: Array[Double]) = r(j0) * (1 - wd) + r(j1) * wd
        bil(s(i0)) * (1 - wf) + bil(s(i1)) * wf
      }
    }
  }

  /**
   * dirspec (pyDIWASP dirspec.py:23-189): data columns are sensors (≤3),
   * layout(0/1/2)(m) = x/y/z of sensor m, datatypes e.g. ("pres","velx","vely").
   * Matches the reference pipeline: estimator → clamp → interpspec onto the
   * user grid (when `interpTo` given) → smoothspec (default ON, as
   * EP["smooth"]) → infospec.
   */
  def dirspec(data: Array[Array[Double]], datatypes: Array[String],
              layout: Array[Array[Double]], depth: Double, fs: Double,
              nfft: Int, dres: Int, method: String, miter: Int,
              fmin: Double, fmax: Double, smooth: Boolean = true,
              interpTo: Option[(Array[Double], Array[Double])] = None): DirSpec = {
    val szd = data.length
    val detrended = data.map(Puv.detrendLinear)

    // cross-power spectra, dropping the DC bin (xps[1 : nfft/2+1])
    val full = Array.tabulate(szd, szd)((m, n) =>
      csd(detrended(m), detrended(n), nfft, fs))
    val f = Array.tabulate(nfft / 2)(i => (i + 1) * fs / nfft)
    val xpsAll = Array.tabulate(szd, szd)((m, n) =>
      Array.tabulate(nfft / 2)(i => full(m)(n)(i + 1)))

    val omega = f.map(2.0 * math.Pi * _)
    val wns = omega.map(wavenumber(_, depth))
    val pidirs = Array.tabulate(dres)(j => -math.Pi + j * 2.0 * math.Pi / dres)

    val trmAll = Array.tabulate(szd)(m =>
      transferMatrix(datatypes(m), omega, pidirs, wns, layout(2)(m), depth))
    val kxAll = Array.tabulate(szd, szd) { (m, n) =>
      Array.tabulate(f.length, dres) { (i, j) =>
        wns(i) * ((layout(0)(n) - layout(0)(m)) * math.cos(pidirs(j)) +
          (layout(1)(n) - layout(1)(m)) * math.sin(pidirs(j)))
      }
    }
    // Ss normalization: auto-spectrum / max-over-dirs(trm)^2
    val ssAll = Array.tabulate(szd)(m =>
      Array.tabulate(f.length) { i =>
        val mx = trmAll(m)(i).max
        xpsAll(m)(m)(i) / C(mx * mx, 0)
      })

    // restrict to the user band
    val keep = f.indices.filter(i => f(i) >= fmin && f(i) <= fmax).toArray
    val fK = keep.map(f)
    val xps = Array.tabulate(szd, szd)((m, n) => keep.map(xpsAll(m)(n)))
    val trm = Array.tabulate(szd)(m => keep.map(trmAll(m)))
    val kx = Array.tabulate(szd, szd)((m, n) => keep.map(kxAll(m)(n)))
    val ss = Array.tabulate(szd)(m => keep.map(ssAll(m)))

    val sRaw = method.toUpperCase match {
      case "DFTM" => dftm(xps, trm, kx, ss, dres)
      case "IMLM" => imlm(xps, trm, kx, ss, dres, miter)
      case other  => throw new IllegalArgumentException(s"unknown method $other")
    }
    // NaN / negative → 0 (dirspec.py:160)
    val clamped = sRaw.map(_.map(v => if (v.isNaN || v < 0) 0.0 else v))

    // interpspec onto user grid (dirspec.py:162), then smoothspec (:168)
    val (fFin, dFin, sInterp) = interpTo match {
      case Some((fU, dU)) => (fU, dU, interpSpec(fK, pidirs, clamped, fU, dU))
      case None => (fK, pidirs, clamped)
    }
    val s = if (smooth) smoothSpec(sInterp) else sInterp
    val dresFin = dFin.length

    // infospec (pyDIWASP infospec.py:6-56): integrate over dirs → 1-D, then
    // Hs = 4√(∫∫S), Tp at peak of 1-D spectrum, DTp = peak dir at fp, Dp =
    // dir with the highest frequency-integrated energy
    val ddir = if (dFin.length > 1) dFin(1) - dFin(0) else 2.0 * math.Pi / dres
    val df = if (fFin.length > 1) fFin(1) - fFin(0) else 1.0
    val oneD = s.map(_.sum * ddir)
    val m0 = oneD.sum * df
    val hs = 4.0 * math.sqrt(m0)
    var ip = 0
    var i = 1
    while (i < oneD.length) { if (oneD(i) > oneD(ip)) ip = i; i += 1 }
    val tp = 1.0 / fFin(ip)
    var jp = 0
    var j = 1
    while (j < dresFin) { if (s(ip)(j) > s(ip)(jp)) jp = j; j += 1 }
    val dtp = math.toDegrees(dFin(jp))
    // Dp = direction with the highest energy integrated over all frequencies
    // (pyDIWASP infospec.py: np.argmax(np.sum(S, 0))), not the single 2-D peak
    val dirTotals = new Array[Double](dresFin)
    i = 0
    while (i < s.length) {
      j = 0
      while (j < dresFin) { dirTotals(j) += s(i)(j); j += 1 }
      i += 1
    }
    var bj = 0
    j = 1
    while (j < dresFin) { if (dirTotals(j) > dirTotals(bj)) bj = j; j += 1 }
    val dp = math.toDegrees(dFin(bj))
    DirSpec(fFin, dFin, s, hs, tp, dtp, dp)
  }
}
