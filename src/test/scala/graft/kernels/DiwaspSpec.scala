package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

class DiwaspSpec extends AnyFunSuite {

  test("wavenumber satisfies the dispersion relation") {
    for (t <- Seq(4.0, 8.0, 12.0); h <- Seq(5.0, 15.0)) {
      val omega = 2 * math.Pi / t
      val k = Diwasp.wavenumber(omega, h)
      val res = 9.81 * k * math.tanh(k * h)
      assert(math.abs(res - omega * omega) / (omega * omega) < 1e-6,
        s"T=$t h=$h")
    }
  }

  test("complex matrix inverse: A * inv(A) = I") {
    import Diwasp.C
    val a = Array(
      Array(C(2, 1), C(0.5, -0.3), C(0.1, 0)),
      Array(C(0.5, 0.3), C(3, 0), C(-0.2, 0.1)),
      Array(C(0.1, 0), C(-0.2, -0.1), C(1.5, 0.2)))
    val ia = Diwasp.inv(a)
    for (i <- 0 until 3; j <- 0 until 3) {
      var s = C.zero
      for (k <- 0 until 3) s = s + a(i)(k) * ia(k)(j)
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(s.re - expected) < 1e-10 && math.abs(s.im) < 1e-10,
        s"($i,$j) = $s")
    }
  }

  test("csd auto-spectrum Parseval (hamming, no overlap)") {
    val rnd = new scala.util.Random(5)
    val x = Array.fill(2048)(rnd.nextGaussian())
    val s = Diwasp.csd(x, x, 256, 1.0)
    val df = 1.0 / 256
    val integ = s.map(_.re).sum * df
    val v = Puv.popVar(x)
    assert(math.abs(integ - v) / v < 0.1, s"integ=$integ var=$v")
  }

  /** Synthetic PUV burst: wave of period 8 s propagating toward dirDeg
    * (trig convention, CCW from +x). Linear theory amplitudes at sensor
    * heights; u = U cos(dir)·cos(phase), v = U sin(dir)·cos(phase),
    * p in phase with elevation. */
  private def puvBurst(n: Int, fs: Double, dirDeg: Double, depth: Double,
                       zp: Double, zuv: Double) = {
    val f0 = 0.125
    val k = Diwasp.wavenumber(2 * math.Pi * f0, depth)
    val a = 0.5
    val dirR = math.toRadians(dirDeg)
    val aP = a * math.cosh(k * zp) / math.cosh(k * depth)
    val aU = a * 2 * math.Pi * f0 * math.cosh(k * zuv) / math.sinh(k * depth)
    val rnd = new scala.util.Random(17)
    val p = Array.tabulate(n)(i => aP * math.cos(2 * math.Pi * f0 * i / fs) + rnd.nextGaussian() * 1e-3)
    val u = Array.tabulate(n)(i => aU * math.cos(dirR) * math.cos(2 * math.Pi * f0 * i / fs) + rnd.nextGaussian() * 1e-3)
    val v = Array.tabulate(n)(i => aU * math.sin(dirR) * math.cos(2 * math.Pi * f0 * i / fs) + rnd.nextGaussian() * 1e-3)
    (p, u, v)
  }

  private def runDirspec(method: String, dirDeg: Double): Diwasp.DirSpec = {
    val depth = 10.0; val zp = 0.5; val zuv = 1.0
    val (p, u, v) = puvBurst(4096, 1.0, dirDeg, depth, zp, zuv)
    Diwasp.dirspec(
      data = Array(p, u, v),
      datatypes = Array("pres", "velx", "vely"),
      layout = Array(Array(0, 0, 0), Array(0, 0, 0), Array(zp, zuv, zuv)),
      depth = depth, fs = 1.0, nfft = 256, dres = 90,
      method = method, miter = 20, fmin = 0.05, fmax = 0.45)
  }

  test("DFTM: peak period and direction recovered for a 30-degree wave") {
    val d = runDirspec("DFTM", 30.0)
    assert(math.abs(d.tp - 8.0) < 0.5, s"Tp=${d.tp}")
    // direction of the 2-D peak within one directional bin (4 deg) + spread
    assert(math.abs(d.dtp - 30.0) < 15.0, s"DTp=${d.dtp}")
    assert(d.hs > 0.5 && d.hs < 2.5, s"Hs=${d.hs}")
  }

  test("IMLM: sharper estimate, same peak direction") {
    val d = runDirspec("IMLM", 30.0)
    assert(math.abs(d.tp - 8.0) < 0.5, s"Tp=${d.tp}")
    assert(math.abs(d.dtp - 30.0) < 15.0, s"DTp=${d.dtp}")
    assert(d.hs > 0.3 && d.hs < 3.0, s"Hs=${d.hs}")
  }

  test("full S(f,dir) grid: 2-D peak sits at the wave frequency/direction") {
    val d = runDirspec("DFTM", 30.0)
    // grid dims match the reported axes
    assert(d.s.length == d.freqs.length)
    assert(d.s.head.length == d.dirs.length)
    // locate the 2-D maximum
    var (pf, pd, pmax) = (0, 0, Double.MinValue)
    for (i <- d.s.indices; j <- d.s(i).indices)
      if (d.s(i)(j) > pmax) { pmax = d.s(i)(j); pf = i; pd = j }
    assert(pmax > 0.0)
    // peak frequency bin within one df of 1/8 Hz
    assert(math.abs(d.freqs(pf) - 0.125) < 1.0 / 256 + 1e-9,
      s"peak f=${d.freqs(pf)}")
    // peak direction equals the reported DTp (same cell) and is near 30 deg
    assert(math.abs(math.toDegrees(d.dirs(pd)) - d.dtp) < 1e-9)
    assert(math.abs(d.dtp - 30.0) < 15.0)
    // all spectral density non-negative
    assert(d.s.forall(_.forall(v => v >= 0.0 || v.isNaN == false)))
  }

  test("direction flips with wave direction") {
    val d1 = runDirspec("DFTM", 30.0)
    val d2 = runDirspec("DFTM", -60.0)
    assert(math.abs(d2.dtp - (-60.0)) < 15.0, s"DTp=${d2.dtp}")
    assert(math.abs(d1.dtp - d2.dtp) > 45.0)
  }

  test("smoothSpec: flat spectrum is a fixed point; kernel conserves level") {
    val flat = Array.fill(12, 16)(2.5)
    val sm = Diwasp.smoothSpec(flat)
    for (i <- 2 until 10; j <- 2 until 14)
      assert(math.abs(sm(i)(j) - 2.5) < 1e-12)
    // edges untouched (reference smooths only the interior region)
    assert(sm(0)(0) == 2.5 && sm(11)(15) == 2.5)
  }

  test("smoothSpec reduces a single spike and spreads it along both axes") {
    val s = Array.fill(12, 16)(0.0)
    s(6)(8) = 10.0
    val sm = Diwasp.smoothSpec(s)
    assert(sm(6)(8) < 10.0)
    assert(sm(5)(8) > 0 && sm(4)(8) > 0 && sm(6)(7) > 0 && sm(6)(6) > 0)
    assert(sm(3)(8) == 0.0) // 5-point kernel reach only
  }

  test("interpSpec: identity on the same grid, circular direction wrap") {
    val f = Array.tabulate(10)(i => 0.05 + i * 0.05)
    val d = Array.tabulate(8)(j => -math.Pi + j * 2 * math.Pi / 8)
    val s = Array.tabulate(10, 8)((i, j) => i * 1.0 + j * 0.1)
    val same = Diwasp.interpSpec(f, d, s, f, d)
    for (i <- 0 until 10; j <- 0 until 8)
      assert(math.abs(same(i)(j) - s(i)(j)) < 1e-12)
    // a direction 2pi above an existing grid point wraps onto it
    val dWrapped = d.map(_ + 2 * math.Pi)
    val wrapped = Diwasp.interpSpec(f, d, s, f, dWrapped)
    for (i <- 0 until 10; j <- 0 until 8)
      assert(math.abs(wrapped(i)(j) - s(i)(j)) < 1e-12)
  }

  test("interpSpec: out-of-range frequencies are zero (griddata NaN -> 0)") {
    val f = Array(0.1, 0.2, 0.3)
    val d = Array(-math.Pi, 0.0)
    val s = Array.fill(3, 2)(1.0)
    val out = Diwasp.interpSpec(f, d, s, Array(0.05, 0.15, 0.45), d)
    assert(out(0).forall(_ == 0.0))
    assert(out(1).forall(v => math.abs(v - 1.0) < 1e-12))
    assert(out(2).forall(_ == 0.0))
  }
}
