package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Domain scalar functions (SURVEY §2.8) as pure Spark Column expressions —
 * fully codegen'd, no UDFs. Each cites its reference definition.
 *
 * Numerical-determinism convention: fractional powers are expanded to
 * sqrt/multiply chains (x^1.5 = x*sqrt(x)) — sqrt is IEEE-correctly-rounded
 * everywhere, while pow() is libm-dependent. Integer powers are expanded to
 * multiplications. Only transcendentals (sin/cos/atan2/tanh/cosh) may differ
 * in the last ulp across engines.
 */
object Physics {

  /** Schemel (2001) salinity from specific conductance [µS/cm]
    * (stglib/core/utils.py:1494-1513). */
  def salinityFromSpcon(spcon: Column): Column = {
    val r = spcon / 53087.0
    val sr = sqrt(r)
    lit(0.0120) + lit(-0.2174) * sr + lit(25.3283) * r +
      lit(13.7714) * r * sr + lit(-6.4788) * r * r + lit(2.5842) * r * r * sr
  }

  /** Inverse Schemel: specific conductance [µS/cm] from salinity
    * (stglib/core/utils.py:1516-1532). */
  def spconFromSalinity(s: Column): Column = {
    val ss = sqrt(s)
    s / 35.0 * 53087.0 + s * (s - 35.0) *
      (lit(-16.072) + lit(4.1495) * ss + lit(-0.5345) * s + lit(0.0261) * s * ss)
  }

  /** Aqua TROLL conductivity ratio Rt (stglib/troll.py:316-322). */
  def trollRt(t: Column, ac: Column): Column =
    ac / (lit(29752.63) + lit(830.5102) * t + lit(3.429338) * t * t +
      lit(-0.02193934) * t * t * t)

  /** Aqua TROLL practical salinity from T and actual conductivity
    * (stglib/troll.py:343-390). NOTE: the reference function's temperature-
    * correction terms are dead code (bare expression statements after
    * `return`); the observed behavior is the a-polynomial only, reproduced
    * faithfully here. */
  def trollSalinity(t: Column, ac: Column): Column = {
    val rt = trollRt(t, ac)
    val srt = sqrt(rt)
    lit(0.0080) + lit(-0.1692) * srt + lit(25.3851) * rt +
      lit(14.0941) * rt * srt + lit(-7.0261) * rt * rt + lit(2.7081) * rt * rt * srt
  }

  /** Aqua TROLL seawater density [g/cm³] (stglib/troll.py:393-408). */
  def trollDensity(t: Column, s: Column): Column = {
    val t2 = t * t
    val rho0 = lit(999.842594) + lit(0.06793952) * t + lit(-0.00909529) * t2 +
      lit(1.001685e-4) * t2 * t + lit(-1.120083e-6) * t2 * t2 +
      lit(6.536332e-9) * t2 * t2 * t
    val a = lit(0.824493) + lit(-0.004089) * t + lit(7.6438e-5) * t2 +
      lit(-8.2467e-7) * t2 * t + lit(5.3875e-9) * t2 * t2
    val b = lit(-0.00572466) + lit(1.0227e-4) * t + lit(-1.6546e-6) * t2
    (rho0 + a * s + b * s * sqrt(s) + lit(0.000483140) * s * s) / 1000.0
  }

  /** UNESCO EOS-80 seawater density ρ(S,T,p) [kg/m³] via the secant bulk
    * modulus (Millero & Poisson 1981; UNESCO 1983). The reference computes
    * density with gsw.rho (TEOS-10, stglib/core/utils.py:1982) — EOS-80
    * agrees to ~0.01 kg/m³ over oceanographic ranges and uses only
    * +−×÷√, making it reproducible bit-for-bit in any SQL engine.
    * p in decibar. */
  def rhoEos80(s: Column, t: Column, pDbar: Column): Column = {
    val t2 = t * t
    val rho0 = lit(999.842594) + lit(0.06793952) * t + lit(-0.00909529) * t2 +
      lit(1.001685e-4) * t2 * t + lit(-1.120083e-6) * t2 * t2 +
      lit(6.536332e-9) * t2 * t2 * t
    val a = lit(0.824493) + lit(-4.0899e-3) * t + lit(7.6438e-5) * t2 +
      lit(-8.2467e-7) * t2 * t + lit(5.3875e-9) * t2 * t2
    val b = lit(-0.00572466) + lit(1.0227e-4) * t + lit(-1.6546e-6) * t2
    val rhoST0 = rho0 + a * s + b * s * sqrt(s) + lit(0.000483140) * s * s
    // secant bulk modulus K(S,T,p), p in bar
    val p = pDbar / 10.0
    val kw = lit(19652.21) + lit(148.4206) * t + lit(-2.327105) * t2 +
      lit(1.360477e-2) * t2 * t + lit(-5.155288e-5) * t2 * t2
    val kst0 = kw +
      s * (lit(54.6746) + lit(-0.603459) * t + lit(1.09987e-2) * t2 +
        lit(-6.1670e-5) * t2 * t) +
      s * sqrt(s) * (lit(7.944e-2) + lit(1.6483e-2) * t + lit(-5.3009e-4) * t2)
    val aw = lit(3.239908) + lit(1.43713e-3) * t + lit(1.16092e-4) * t2 +
      lit(-5.77905e-7) * t2 * t
    val aa = aw + s * (lit(2.2838e-3) + lit(-1.0981e-5) * t +
      lit(-1.6078e-6) * t2) + lit(1.91075e-4) * s * sqrt(s)
    val bw = lit(8.50935e-5) + lit(-6.12293e-6) * t + lit(5.2787e-8) * t2
    val bb = bw + s * (lit(-9.9348e-7) + lit(2.0816e-8) * t + lit(9.1697e-10) * t2)
    val k = kst0 + aa * p + bb * p * p
    rhoST0 / (lit(1.0) - p / k)
  }

  /** Somigliana/GRS-80 surface gravity at latitude [deg] — the p=0 case of
    * gsw.grav used by pres2dep (stglib/core/utils.py:1983). Scala-side
    * constant (latitude is a dataset attribute). */
  def grav(latDeg: Double): Double = {
    val x = math.sin(math.toRadians(latDeg))
    val sin2 = x * x
    9.780327 * (1.0 + (5.2792e-3 + 2.32e-5 * sin2) * sin2)
  }

  /** pres2dep: depth [m] = P/(ρg)·10⁴ with P in dbar
    * (stglib/core/utils.py:1926-1985). */
  def pres2dep(pDbar: Column, s: Column, t: Column, latDeg: Double): Column =
    pDbar / (rhoEos80(s, t, pDbar) * grav(latDeg)) * 10000.0

  /** Mackenzie (1981) nine-term sound speed [m/s]; S in PSU, T in °C, D in m.
    * The reference adjusts altimeter ranges with gsw.sound_speed
    * (stglib/eofe.py:398) — Mackenzie agrees to ~0.1 m/s in coastal ranges
    * and is exactly reproducible cross-engine (+−× only). */
  def soundSpeedMackenzie(s: Column, t: Column, d: Column): Column = {
    val t2 = t * t
    val s35 = s - 35.0
    lit(1448.96) + lit(4.591) * t + lit(-5.304e-2) * t2 +
      lit(2.374e-4) * t2 * t + lit(1.340) * s35 + lit(1.630e-2) * d +
      lit(1.675e-7) * d * d + lit(-1.025e-2) * t * s35 +
      lit(-7.139e-13) * t * d * d * d
  }

  /** Wavenumber from angular frequency and depth — Wiberg & Sherwood (2009)
    * with exactly 3 unrolled Newton iterations (stglib/core/waves.py:988-1007). */
  def qkfs(omega: Column, h: Column): Column = {
    val x = omega * omega * h / 9.81
    val y0 = when(x < 1.0, sqrt(x)).otherwise(x)
    def newton(y: Column): Column = {
      val t = tanh(y)
      y - ((y * t - x) / (t + y * (lit(1.0) - t * t)))
    }
    newton(newton(newton(y0))) / h
  }

  /** Pressure transfer function Kp = cosh(kz)/cosh(kh); NaN k (0 freq) → 1
    * (stglib/core/waves.py:778-803). */
  def transferKp(k: Column, h: Column, z: Column): Column =
    when(isnan(k) || k.isNull, 1.0).otherwise(cosh(k * z) / cosh(k * h))

  /** u,v → speed (stglib/core/utils.py:1893-1904). */
  def uvSpeed(u: Column, v: Column): Column = sqrt(u * u + v * v)

  /** u,v → compass heading, degrees CW from North, [0,360)
    * (stglib/core/utils.py:1893-1904). */
  def uvHeading(u: Column, v: Column): Column =
    (degrees(atan2(u, v)) + 360.0) % 360.0

  /** speed,heading → u (stglib/core/utils.py:1881-1890). */
  def spdU(speed: Column, heading: Column): Column = speed * sin(radians(heading))
  def spdV(speed: Column, heading: Column): Column = speed * cos(radians(heading))

  /** Magnetic-declination rotation (stglib/aqd/aqdutils.py:427-432):
    * u' = u cosθ + v sinθ. */
  def rotateU(u: Column, v: Column, deg: Double): Column =
    u * cos(lit(Math.toRadians(deg))) + v * sin(lit(Math.toRadians(deg)))

  /** v' = −u sinθ + v cosθ. */
  def rotateV(u: Column, v: Column, deg: Double): Column =
    -u * sin(lit(Math.toRadians(deg))) + v * cos(lit(Math.toRadians(deg)))

  /** Polar (CCW from +x) → compass (CW from N) (stglib/core/waves.py:964-975). */
  def polar2compass(polar: Column): Column = {
    val c = -polar + 90.0
    when(c < 0.0, c + 360.0).otherwise(c)
  }

  /** "Bearing to" → "bearing from" (stglib/core/waves.py:978-986). */
  def to2from(todir: Column): Column = {
    val f = todir - 180.0
    when(f < 0.0, f + 360.0).otherwise(f)
  }

  /** Linear SSC calibration: ssc = c1·turb + c0 (np.polyval with 2 coefs;
    * stglib/core/utils.py:2006-2041). */
  def turbidityToSsc(turb: Column, c1: Double, c0: Double): Column =
    lit(c1) * turb + lit(c0)

  /** EPIC julian-day int from epoch microseconds: floor(jd) where
    * jd = to_julian_date + 0.5 (stglib/core/utils.py:899-915); exact integer
    * arithmetic (unix epoch = JD 2440587.5). */
  def epicTime(tsUs: Column): Column =
    (tsUs.cast("long") / lit(86400000000L)).cast("long") + 2440588L

  /** EPIC ms-of-day int (stglib/core/utils.py:917-919), exact. */
  def epicTime2(tsUs: Column): Column =
    ((tsUs.cast("long") % lit(86400000000L)) / lit(1000L)).cast("long")

  /** Bin center distance from transducer for bin i (0-based):
    * binSize/2 + i·binSize (stglib/eofe.py:304-327, create_bindist
    * stglib/aqd/aqdutils.py:1041-1058). */
  def binDist(bin: Column, binSize: Double): Column =
    lit(binSize / 2) + bin * binSize

  /** Bin height above seafloor: instrument height ± bindist by orientation
    * (stglib/eofe.py:330-345). */
  def binHeight(bindist: Column, instHeight: Double, orientationUp: Boolean): Column =
    if (orientationUp) lit(instHeight) + bindist else lit(instHeight) - bindist
}

/** Symbolic 3×3 matrices over SQL expression strings — used to expand the
  * per-row coordinate-transform matmul (stglib/aqd/aqdutils.py:372-432,
  * coord_transform :156-214) into closed-form column expressions that both
  * Catalyst and the DuckDB oracle evaluate identically. */
object Mat3 {
  type M = Array[Array[String]]

  def mul(a: M, b: M): M = Array.tabulate(3, 3) { (i, j) =>
    val terms = (0 until 3).flatMap { k =>
      (a(i)(k), b(k)(j)) match {
        case ("0", _) | (_, "0") => None
        case ("1", x)            => Some(x)
        case (x, "1")            => Some(x)
        case (x, y)              => Some(s"($x)*($y)")
      }
    }
    if (terms.isEmpty) "0" else terms.mkString(" + ")
  }

  /** Heading matrix of hh [rad] (make_heading_np, stglib/aqd/aqdutils.py:372-381). */
  def heading(hh: String): M = Array(
    Array(s"cos($hh)", s"sin($hh)", "0"),
    Array(s"-sin($hh)", s"cos($hh)", "0"),
    Array("0", "0", "1"))

  /** Tilt matrix of pitch pp, roll rr [rad] (make_tilt_np, :384-393). */
  def tilt(pp: String, rr: String): M = Array(
    Array(s"cos($pp)", s"-sin($pp)*sin($rr)", s"-cos($rr)*sin($pp)"),
    Array("0", s"cos($rr)", s"-sin($rr)"),
    Array(s"sin($pp)", s"sin($rr)*cos($pp)", s"cos($pp)*cos($rr)"))

  def const(m: Array[Array[Double]]): M = m.map(_.map(_.toString))

  /** R·[v1,v2,v3] → three SQL strings. */
  def apply3(r: M, v: Seq[String]): Seq[String] =
    (0 until 3).map { i =>
      (0 until 3).flatMap { k =>
        r(i)(k) match {
          case "0" => None
          case "1" => Some(v(k))
          case x   => Some(s"($x)*(${v(k)})")
        }
      }.mkString(" + ")
    }
}
