package graft.kernels

/**
 * Sonar polar→cartesian image regrid (stglib/son/nc2xy.py:60-123): per scan,
 * bilinearly interpolate a (θ, range) fan image onto a regular x/y grid with
 * compass orientation (north up). Array-in/array-out kernel, run per scan
 * from mapGroups — the reference loops scans on the driver.
 */
object SonarRegrid {

  /** Bilinear interpolation over a rectilinear (ascending) grid —
    * scipy.interpolate.RegularGridInterpolator semantics with
    * bounds_error=False (outside → NaN). */
  def interp2(xs: Array[Double], ys: Array[Double], z: Array[Array[Double]],
              xq: Double, yq: Double): Double = {
    if (xq < xs.head || xq > xs.last || yq < ys.head || yq > ys.last) return Double.NaN
    var i = java.util.Arrays.binarySearch(xs, xq)
    if (i < 0) i = -i - 2
    if (i >= xs.length - 1) i = xs.length - 2
    var j = java.util.Arrays.binarySearch(ys, yq)
    if (j < 0) j = -j - 2
    if (j >= ys.length - 1) j = ys.length - 2
    val tx = (xq - xs(i)) / (xs(i + 1) - xs(i))
    val ty = (yq - ys(j)) / (ys(j + 1) - ys(j))
    z(i)(j) * (1 - tx) * (1 - ty) + z(i + 1)(j) * tx * (1 - ty) +
      z(i)(j + 1) * (1 - tx) * ty + z(i + 1)(j + 1) * tx * ty
  }

  /**
   * Regrid one scan: thetaDeg (per sweep line, any order), horzRng (per
   * sample along the line), image (sweep × range) → square image over
   * [-totalRange, totalRange] at dxy spacing, compass-oriented.
   * Returns (axis, image) with image indexed (x, y).
   */
  def regrid(thetaDeg: Array[Double], horzRng: Array[Double],
             image: Array[Array[Double]], totalRange: Double,
             dxy: Double): (Array[Double], Array[Array[Double]]) = {
    // ascending theta order; drop NaN-theta sweep lines first — a NaN
    // grid coordinate passes the interp2 bounds guard (NaN comparisons
    // are false) and then binarySearch yields index -1 (found by the
    // FuzzChains all-NaN gate). scipy's RegularGridInterpolator raises
    // ValueError on a non-ascending grid here, so failing loudly below
    // when nothing usable remains matches the reference.
    val lineKeep = thetaDeg.indices.filter(i => !thetaDeg(i).isNaN)
    val order = lineKeep.sortBy(thetaDeg)
    val th = order.map(thetaDeg).toArray
    val im0 = order.map(image).toArray
    // drop NaN ranges (can't interpolate)
    val keep = horzRng.indices.filter(i => !horzRng(i).isNaN).toArray
    val rng = keep.map(horzRng)
    val im = im0.map(row => keep.map(row))
    require(th.length >= 2 && rng.length >= 2,
      s"sonar scan not regriddable: ${th.length} sweep line(s) with finite " +
        s"theta and ${rng.length} finite range sample(s); need >= 2 of each")

    val n = math.floor(2 * totalRange / dxy).toInt + 1
    val axis = Array.tabulate(n)(i => -totalRange + i * dxy)
    val out = Array.tabulate(n, n) { (ix, iy) =>
      val x = axis(ix); val y = axis(iy)
      val rho = math.sqrt(x * x + y * y)
      // math → compass convention, [0, 360)
      val thetaMath = math.toDegrees(math.atan2(y, x))
      val thetaComp = (((-thetaMath + 90) % 360) + 360) % 360
      interp2(th, rng, im, thetaComp, rho)
    }
    (axis, out)
  }
}
