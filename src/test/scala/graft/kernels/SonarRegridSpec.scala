package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

class SonarRegridSpec extends AnyFunSuite {

  test("bilinear interp: exact at nodes, linear between, NaN outside") {
    val xs = Array(0.0, 1.0, 2.0)
    val ys = Array(0.0, 10.0)
    val z = Array(Array(1.0, 2.0), Array(3.0, 4.0), Array(5.0, 6.0))
    assert(SonarRegrid.interp2(xs, ys, z, 1.0, 0.0) == 3.0)
    assert(SonarRegrid.interp2(xs, ys, z, 0.5, 0.0) == 2.0)
    assert(SonarRegrid.interp2(xs, ys, z, 1.0, 5.0) == 3.5)
    assert(SonarRegrid.interp2(xs, ys, z, -0.1, 0.0).isNaN)
    assert(SonarRegrid.interp2(xs, ys, z, 0.0, 10.1).isNaN)
  }

  test("polar fan regrids to compass-oriented cartesian image") {
    // fan covering all directions, intensity = range (so the image is a
    // radial ramp) — after regrid, value at (x, y) ~ sqrt(x^2+y^2)
    val thetas = Array.tabulate(72)(i => i * 5.0)
    val ranges = Array.tabulate(50)(i => 0.2 + i * 0.2) // 0.2..10.0
    val image = Array.tabulate(72, 50)((_, r) => ranges(r))
    val (axis, out) = SonarRegrid.regrid(thetas, ranges, image, totalRange = 10.0, dxy = 0.5)
    assert(axis.length == 41 && out.length == 41)
    val n = axis.length
    var checked = 0
    for (ix <- 0 until n; iy <- 0 until n) {
      val rho = math.sqrt(axis(ix) * axis(ix) + axis(iy) * axis(iy))
      if (rho > 0.5 && rho < 9.5 && !out(ix)(iy).isNaN) {
        assert(math.abs(out(ix)(iy) - rho) < 0.05,
          s"at (${axis(ix)}, ${axis(iy)}): ${out(ix)(iy)} vs $rho")
        checked += 1
      }
    }
    assert(checked > 500)
    // outside the fan radius → NaN
    assert(out(0)(0).isNaN) // corner at rho = sqrt(200) > 10
  }

  test("north-up compass orientation: a beam at theta=0 (north) paints +y") {
    // single bright beam at compass 0 deg (north): after regrid the +y axis
    // should be bright, +x (east, compass 90) dark
    val thetas = Array.tabulate(72)(i => i * 5.0)
    val ranges = Array.tabulate(20)(i => 0.5 + i * 0.5)
    val image = Array.tabulate(72, 20)((t, _) => if (thetas(t) == 0.0) 100.0 else 0.0)
    val (axis, out) = SonarRegrid.regrid(thetas, ranges, image, 10.0, 0.5)
    val mid = axis.length / 2
    val northVal = out(mid)(mid + 8) // x=0, y=+4
    val eastVal = out(mid + 8)(mid)  // x=+4, y=0
    assert(northVal > 50.0, s"north=$northVal")
    assert(eastVal < 5.0, s"east=$eastVal")
  }
}
