package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

class PuvSpec extends AnyFunSuite {

  private def mono(n: Int, fs: Double, f0: Double, a: Double, phase: Double = 0.0) =
    Array.tabulate(n)(i => a * math.sin(2.0 * math.Pi * f0 * i / fs + phase))

  test("Parseval: boxcar full-length FFT preserves variance exactly (reference test_puv_quick invariant)") {
    val n = 1024
    val rnd = new scala.util.Random(3)
    val u = Array.fill(n)(rnd.nextGaussian() * 0.1)
    val ud = Puv.detrendLinear(u)
    val (f, g) = Welch.psd(ud, fs = 1.0, nperseg = n, window = "boxcar")
    val df = f(1) - f(0)
    assert(Puv.varianceError(ud, g, df) < 1e-8,
      s"variance error ${Puv.varianceError(ud, g, df)}%")
  }

  test("detrendLinear removes an exact linear trend") {
    val x = Array.tabulate(100)(i => 3.0 + 0.25 * i)
    assert(Puv.detrendLinear(x).forall(v => math.abs(v) < 1e-10))
  }

  test("puv_quick on a monochromatic deep-ish wave recovers Tpp=Tpu=10s and sensible heights") {
    val n = 2048; val fs = 1.0; val f0 = 0.1
    val depth = 10.0; val zp = 0.5; val zuv = 1.0
    val k = Spectral.qkfs(2 * math.Pi * f0, depth)
    val aEta = 0.5 // elevation amplitude
    val rho = 1025.0; val g = 9.81
    // linear theory: pressure (dbar) at zp; u velocity at zuv; v = 0-ish
    val aP = aEta * math.cosh(k * zp) / math.cosh(k * depth) // meters head
    val aU = aEta * 2 * math.Pi * f0 * math.cosh(k * zuv) / math.sinh(k * depth)
    val rnd = new scala.util.Random(11)
    val p = Array.tabulate(n)(i => 10.0 + aP * math.sin(2 * math.Pi * f0 * i) + rnd.nextGaussian() * 1e-4)
    val u = Array.tabulate(n)(i => aU * math.sin(2 * math.Pi * f0 * i) + rnd.nextGaussian() * 1e-4)
    val v = Array.tabulate(n)(i => 0.3 * aU * math.sin(2 * math.Pi * f0 * i) + rnd.nextGaussian() * 1e-4)
    // note: puv_quick expects pressure in dbar; 1 dbar ~ 1 m head: the rho*g
    // factor scales Gpp and Hp consistently, so heights come out in meters
    val r = Puv.puvQuick(p, u, v, depth, zp, zuv, fs, fftLength = 512)
    assert(math.abs(r.tpp - 10.0) < 0.5, s"Tpp=${r.tpp}")
    assert(math.abs(r.tpu - 10.0) < 0.5, s"Tpu=${r.tpu}")
    // Hrms for a monochromatic wave of amplitude a: Hrms = 2*sqrt(2*a^2/2) = 2a
    val expectedHrms = 2.0 * aEta
    assert(math.abs(r.hrmsp - expectedHrms) / expectedHrms < 0.1,
      s"Hrmsp=${r.hrmsp} expected ~$expectedHrms")
    assert(math.abs(r.hrmsu - expectedHrms) / expectedHrms < 0.15,
      s"Hrmsu=${r.hrmsu} expected ~$expectedHrms")
    // u,v positively correlated -> phir in (0, pi/2); azr = 90 - deg(phir)
    assert(r.phir > 0 && r.phir < math.Pi / 2, s"phir=${r.phir}")
    // ubr should approximate the rms orbital velocity sqrt(2*var(u)+2*var(v))
    assert(math.abs(r.ubr - r.ubrCheck) / r.ubrCheck < 0.15,
      s"ubr=${r.ubr} check=${r.ubrCheck}")
  }
}
