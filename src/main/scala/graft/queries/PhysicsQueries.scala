package graft.queries

import graft.functions.{Mat3, Physics => P}
import org.apache.spark.sql.functions._

/**
 * Scalar physics / geo / domain functions (SURVEY §2.8) and the per-record
 * matrix transform (§2.9), driven over synthetic columns derived from events.
 *
 * Determinism: formulas use only +,−,×,÷,sqrt (IEEE-exact, identical across
 * engines) wherever possible; expressions involving transcendentals
 * (sin/cos/atan2/tanh/cosh — libm may differ in the last ulp) round outputs
 * to 8 decimals on both sides.
 */
object PhysicsQueries {
  import Tables._

  // shared derived-input SQL (identical text on both engines)
  private val trollIn = Seq("5 + value/5 as t", "20000 + value*100 as ac")
  private val uvIn =
    Seq("value - 50 as u", "cast(event_id % 101 as double) - 50 as v")

  // qkfs CTE chain (3 unrolled Newton iterations) — mirrors Physics.qkfs
  private def qkfsSql(src: String): String =
    s"""WITH base AS (
       |  SELECT event_id, 2*pi()/(5 + value/10) AS omega,
       |         10 + cast(event_id % 50 as double)/10 AS h FROM $src),
       |s0 AS (SELECT *, omega*omega*h/9.81 AS x FROM base),
       |s1 AS (SELECT *, CASE WHEN x < 1.0 THEN sqrt(x) ELSE x END AS y0 FROM s0),
       |i1 AS (SELECT *, y0 - ((y0*((exp(2*y0)-1)/(exp(2*y0)+1)) - x)/(((exp(2*y0)-1)/(exp(2*y0)+1)) + y0*(1 - ((exp(2*y0)-1)/(exp(2*y0)+1))*((exp(2*y0)-1)/(exp(2*y0)+1))))) AS y1 FROM s1),
       |i2 AS (SELECT *, y1 - ((y1*((exp(2*y1)-1)/(exp(2*y1)+1)) - x)/(((exp(2*y1)-1)/(exp(2*y1)+1)) + y1*(1 - ((exp(2*y1)-1)/(exp(2*y1)+1))*((exp(2*y1)-1)/(exp(2*y1)+1))))) AS y2 FROM i1),
       |i3 AS (SELECT *, y2 - ((y2*((exp(2*y2)-1)/(exp(2*y2)+1)) - x)/(((exp(2*y2)-1)/(exp(2*y2)+1)) + y2*(1 - ((exp(2*y2)-1)/(exp(2*y2)+1))*((exp(2*y2)-1)/(exp(2*y2)+1))))) AS y3 FROM i2)
       |SELECT event_id, round(y3/h, 8) AS k,
       |       round(((exp((y3/h) * 0.5)+exp(-((y3/h) * 0.5)))/2)/((exp((y3/h) * h)+exp(-((y3/h) * h)))/2), 8) AS kp
       |FROM i3""".stripMargin

  /** EOS-80 density SQL mirroring Physics.rhoEos80 term-for-term (same
    * association order → bit-identical doubles). Expects columns t, s, p
    * (p in dbar) in scope; emits a SELECT-fragment expression. */
  private def rhoEos80Sql: String =
    """(999.842594 + 0.06793952*t + (-0.00909529)*(t*t) + 1.001685e-4*(t*t)*t
      |   + (-1.120083e-6)*(t*t)*(t*t) + 6.536332e-9*(t*t)*(t*t)*t
      | + (0.824493 + (-4.0899e-3)*t + 7.6438e-5*(t*t) + (-8.2467e-7)*(t*t)*t
      |    + 5.3875e-9*(t*t)*(t*t))*s
      | + ((-0.00572466) + 1.0227e-4*t + (-1.6546e-6)*(t*t))*s*sqrt(s)
      | + 0.000483140*s*s)
      |/ (1.0 - (p/10.0) /
      |   (19652.21 + 148.4206*t + (-2.327105)*(t*t) + 1.360477e-2*(t*t)*t
      |      + (-5.155288e-5)*(t*t)*(t*t)
      |    + s*(54.6746 + (-0.603459)*t + 1.09987e-2*(t*t) + (-6.1670e-5)*(t*t)*t)
      |    + s*sqrt(s)*(7.944e-2 + 1.6483e-2*t + (-5.3009e-4)*(t*t))
      |    + (3.239908 + 1.43713e-3*t + 1.16092e-4*(t*t) + (-5.77905e-7)*(t*t)*t
      |       + s*(2.2838e-3 + (-1.0981e-5)*t + (-1.6078e-6)*(t*t))
      |       + 1.91075e-4*s*sqrt(s))*(p/10.0)
      |    + (8.50935e-5 + (-6.12293e-6)*t + 5.2787e-8*(t*t)
      |       + s*((-9.9348e-7) + 2.0816e-8*t + 9.1697e-10*(t*t)))*(p/10.0)*(p/10.0)))"""
      .stripMargin.replace("\n", " ")

  private val presIn = Seq("5.0 + value/10.0 as p",
    "30.0 + cast(event_id % 100 as double)/50.0 as s", "8.0 + value/20.0 as t")

  /** Double literal for DuckDB SQL: plain decimal literals with >15 digits
    * parse as DECIMAL and lose the exact double value (the unscaled integer
    * exceeds 2^53); an exponent suffix forces a true DOUBLE (strtod) parse. */
  private def dlit(x: Double): String = {
    val s = x.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  def qs: Seq[Q] = Seq(
    // pres2dep: P[dbar] → sensor depth via EOS-80 rho + Somigliana gravity
    // (stglib/core/utils.py:1926-1985; reference uses gsw.rho/gsw.grav —
    // EOS-80 deviation documented in Physics.rhoEos80)
    Q("pres2dep",
      (s, dir) => {
        val df = events(s, dir).selectExpr("event_id" +: presIn: _*)
        df.select(col("event_id"),
          P.pres2dep(col("p"), col("s"), col("t"), latDeg = 40.0).as("depth"))
      },
      Some(s"""WITH b AS (SELECT event_id, ${presIn.mkString(", ")} FROM events)
             |SELECT event_id, p / ($rhoEos80Sql * ${dlit(P.grav(40.0))}) * 10000.0 AS depth
             |FROM b""".stripMargin)),

    // create_water_depth_var: burst-mean sensor depth + instrument height
    // (stglib/core/utils.py:1052-1100)
    Q("water_depth_var",
      (s, dir) => {
        val df = events(s, dir).selectExpr(
          "event_id" +: "user_id" +: "ts div 21600000000000 as block" +: presIn: _*)
        val dep = P.pres2dep(col("p"), col("s"), col("t"), latDeg = 40.0)
        df.withColumn("dep", dep)
          .groupBy("user_id", "block")
          .agg((Exact.avg(col("dep")) + lit(0.5)).as("water_depth"))
      },
      Some(s"""WITH b AS (SELECT event_id, user_id,
             |    epoch_us(ts) // 21600000000 AS block, ${presIn.mkString(", ")}
             |  FROM events),
             |d AS (SELECT user_id, block,
             |    p / ($rhoEos80Sql * ${dlit(P.grav(40.0))}) * 10000.0 AS dep FROM b)
             |SELECT user_id, block,
             |  ${Exact.avgSql("dep")} + 0.5 AS water_depth
             |FROM d GROUP BY 1, 2""".stripMargin)),

    // calc_cor_brange + calc_boundary_elev (LMSL, down-looking): altimeter
    // range corrected by adjusted sound speed, then datum-referenced seabed
    // elevation (stglib/eofe.py:373-571; reference uses gsw.sound_speed —
    // Mackenzie (1981) deviation documented in Physics.soundSpeedMackenzie)
    Q("cor_brange_elev",
      (s, dir) => {
        val wd = 10.5; val iih = 0.5; val nominalSv = 1500.0; val salAvg = 32.0
        val df = events(s, dir).selectExpr("event_id",
          "2.0 + value/50.0 as alt", "8.0 + value/20.0 as t")
        val med = df.agg(expr("median(alt)").as("__med"))
        val withP = df.crossJoin(broadcast(med))
          .withColumn("pdep", lit(wd) - iih + col("__med") / 2.0)
        val c = P.soundSpeedMackenzie(lit(salAvg), col("t"), col("pdep"))
        withP.select(col("event_id"),
          round(col("alt") / nominalSv * c, 3).as("brange"),
          round(lit(wd) + round(col("alt") / nominalSv * c, 3) - iih, 3)
            .as("boundary_elevation"))
      },
      Some("""WITH b AS (SELECT event_id, 2.0 + value/50.0 AS alt,
             |    8.0 + value/20.0 AS t FROM events),
             |m AS (SELECT median(alt) AS med FROM b),
             |p AS (SELECT b.*, 10.5 - 0.5 + m.med/2.0 AS pdep FROM b, m),
             |c AS (SELECT *,
             |  1448.96 + 4.591*t + (-5.304e-2)*(t*t) + 2.374e-4*(t*t)*t
             |    + 1.340*(32.0 - 35.0) + 1.630e-2*pdep + 1.675e-7*pdep*pdep
             |    + (-1.025e-2)*t*(32.0 - 35.0) + (-7.139e-13)*t*pdep*pdep*pdep AS sv
             |  FROM p)
             |SELECT event_id, round(alt/1500.0*sv, 3) + 0.0 AS brange,
             |  round(10.5 + (round(alt/1500.0*sv, 3) + 0.0) - 0.5, 3) + 0.0
             |    AS boundary_elevation
             |FROM c""".stripMargin)),
    // Schemel salinity ↔ specific conductance round trip
    // (stglib/core/utils.py:1494-1532); sqrt/mult only → exact parity
    Q("salinity_schemel",
      (s, dir) => {
        val df = events(s, dir).withColumn("spcon", lit(100.0) + col("value") * 500.0)
        df.select(col("event_id"),
            P.salinityFromSpcon(col("spcon")).as("sal"),
            P.spconFromSalinity(P.salinityFromSpcon(col("spcon"))).as("spcon_back"))
      },
      Some("""WITH b AS (SELECT event_id, 100.0 + value*500.0 AS spcon FROM events),
             |s AS (SELECT event_id,
             |  0.0120 + (-0.2174)*sqrt(spcon/53087.0) + 25.3283*(spcon/53087.0)
             |   + 13.7714*(spcon/53087.0)*sqrt(spcon/53087.0)
             |   + (-6.4788)*(spcon/53087.0)*(spcon/53087.0)
             |   + 2.5842*(spcon/53087.0)*(spcon/53087.0)*sqrt(spcon/53087.0) AS sal
             |  FROM b)
             |SELECT event_id, sal,
             |  sal/35.0*53087.0 + sal*(sal - 35.0)*
             |    (-16.072 + 4.1495*sqrt(sal) + (-0.5345)*sal + 0.0261*sal*sqrt(sal))
             |  AS spcon_back
             |FROM s""".stripMargin)),

    // Aqua TROLL practical salinity + density (stglib/troll.py:307-408)
    Q("troll_salinity_density",
      (s, dir) => {
        val df = events(s, dir).selectExpr("event_id" +: trollIn: _*)
        val sal = P.trollSalinity(col("t"), col("ac"))
        df.select(col("event_id"), sal.as("sal"),
          P.trollDensity(col("t"), sal).as("rho"))
      },
      Some(s"""WITH b AS (SELECT event_id, ${trollIn.mkString(", ")} FROM events),
             |r AS (SELECT *, ac / (29752.63 + 830.5102*t + 3.429338*t*t + (-0.02193934)*t*t*t) AS rt FROM b),
             |s AS (SELECT *,
             |  0.0080 + (-0.1692)*sqrt(rt) + 25.3851*rt + 14.0941*rt*sqrt(rt)
             |    + (-7.0261)*rt*rt + 2.7081*rt*rt*sqrt(rt) AS sal FROM r)
             |SELECT event_id, sal,
             |  (999.842594 + 0.06793952*t + (-0.00909529)*(t*t) + 1.001685e-4*(t*t)*t
             |     + (-1.120083e-6)*(t*t)*(t*t) + 6.536332e-9*(t*t)*(t*t)*t
             |   + (0.824493 + (-0.004089)*t + 7.6438e-5*(t*t) + (-8.2467e-7)*(t*t)*t + 5.3875e-9*(t*t)*(t*t))*sal
             |   + ((-0.00572466) + 1.0227e-4*t + (-1.6546e-6)*(t*t))*sal*sqrt(sal)
             |   + 0.000483140*sal*sal) / 1000.0 AS rho
             |FROM s""".stripMargin)),

    // qkfs dispersion (3 Newton iterations) + pressure transfer function Kp
    // (stglib/core/waves.py:988-1007, 778-803)
    Q("qkfs_kp",
      (s, dir) => {
        val df = events(s, dir)
          .withColumn("omega", lit(2.0) * lit(Math.PI) / (lit(5.0) + col("value") / 10.0))
          .withColumn("h", lit(10.0) + (col("event_id") % 50).cast("double") / 10.0)
        val k = P.qkfs(col("omega"), col("h"))
        df.select(col("event_id"), round(k, 8).as("k"),
          round(cosh(k * 0.5) / cosh(k * col("h")), 8).as("kp"))
      },
      Some(qkfsSql("events"))),

    // uv↔spd/heading conversions (stglib/core/utils.py:1857-1904)
    Q("uv_spd_convert",
      (s, dir) => {
        val df = events(s, dir).selectExpr("event_id" +: uvIn: _*)
        val spd = P.uvSpeed(col("u"), col("v"))
        val head = P.uvHeading(col("u"), col("v"))
        df.select(col("event_id"), spd.as("spd"),
          round(head, 8).as("heading"),
          round(P.spdU(spd, head), 8).as("u_back"),
          round(P.spdV(spd, head), 8).as("v_back"))
      },
      Some(s"""WITH b AS (SELECT event_id, ${uvIn.mkString(", ")} FROM events),
             |s AS (SELECT event_id, sqrt(u*u + v*v) AS spd,
             |  (degrees(atan2(u, v)) + 360.0) % 360.0 AS head FROM b)
             |SELECT event_id, spd, round(head, 8) + 0.0 AS heading,
             |  round(spd * sin(radians(head)), 8) + 0.0 AS u_back,
             |  round(spd * cos(radians(head)), 8) + 0.0 AS v_back
             |FROM s""".stripMargin)),

    // magnetic-declination rotation (stglib/aqd/aqdutils.py:372-432)
    Q("rotate_magvar",
      (s, dir) => {
        val df = events(s, dir).selectExpr("event_id" +: uvIn: _*)
        df.select(col("event_id"),
          round(P.rotateU(col("u"), col("v"), -1.88), 8).as("u_rot"),
          round(P.rotateV(col("u"), col("v"), -1.88), 8).as("v_rot"))
      },
      Some(s"""WITH b AS (SELECT event_id, ${uvIn.mkString(", ")} FROM events)
             |SELECT event_id,
             |  round(u * cos(radians(-1.88)) + v * sin(radians(-1.88)), 8) AS u_rot,
             |  round(-u * sin(radians(-1.88)) + v * cos(radians(-1.88)), 8) AS v_rot
             |FROM b""".stripMargin)),

    // polar→compass and to→from direction conversions
    // (stglib/core/waves.py:964-986); exact arithmetic
    Q("polar_compass",
      (s, dir) => {
        val df = events(s, dir).withColumn("dir", col("value") * 3.6)
        df.select(col("event_id"),
          P.polar2compass(col("dir")).as("compass"),
          P.to2from(P.polar2compass(col("dir"))).as("fromdir"))
      },
      Some("""WITH b AS (SELECT event_id, value*3.6 AS dir FROM events),
             |c AS (SELECT event_id,
             |  CASE WHEN -dir + 90.0 < 0.0 THEN -dir + 90.0 + 360.0
             |       ELSE -dir + 90.0 END AS compass FROM b)
             |SELECT event_id, compass,
             |  CASE WHEN compass - 180.0 < 0.0 THEN compass - 180.0 + 360.0
             |       ELSE compass - 180.0 END AS fromdir
             |FROM c""".stripMargin)),

    // SSC calibration + unit scaling (stglib/core/utils.py:2006-2041,
    // stglib/iq.py:497-508); exact
    Q("turbidity_ssc",
      (s, dir) => {
        val df = events(s, dir).withColumn("turb", col("value") * 2.0)
        df.select(col("event_id"),
          P.turbidityToSsc(col("turb"), 1.3, 0.2).as("ssc"),
          (col("value") / 1000.0).as("vel_ms"))
      },
      Some("""SELECT event_id, 1.3*(value*2.0) + 0.2 AS ssc,
             |  value/1000.0 AS vel_ms FROM events""".stripMargin)),

    // EPIC two-variable time encoding (stglib/core/utils.py:879-929); exact
    Q("epic_time",
      (s, dir) => events(s, dir)
        .selectExpr("event_id", "ts div 1000 as ts_us")
        .select(col("event_id"),
          P.epicTime(col("ts_us")).as("epic_time"),
          P.epicTime2(col("ts_us")).as("epic_time2"),
          // epic_to_datetime round trip (stglib/core/utils.py:891-894),
          // ms precision
          ((P.epicTime(col("ts_us")) - 2440588L) * 86400000000L +
            P.epicTime2(col("ts_us")) * 1000L).as("ts_back_us")),
      Some("""SELECT event_id,
             |  epoch_us(ts) // 86400000000 + 2440588 AS epic_time,
             |  (epoch_us(ts) % 86400000000) // 1000 AS epic_time2,
             |  (epoch_us(ts) // 86400000000) * 86400000000 +
             |    ((epoch_us(ts) % 86400000000) // 1000) * 1000 AS ts_back_us
             |FROM events""".stripMargin)),

    // wave-product trims (stglib/core/utils.py:752-828), applied in reference
    // order over synthetic wave stats; exact arithmetic
    Q("wave_stat_trims",
      (s, dir) => {
        val df = events(s, dir).selectExpr("event_id",
          "2 + value/10 as wp_peak", "2 + value/12 as wp_4060", "value/50 as wh_4061")
        // trim_max_wp (wp_max=8)
        val c1 = col("wp_peak") < 8.0 && col("wp_4060") < 8.0
        val d1 = df.withColumn("wp_peak", when(c1, col("wp_peak")))
          .withColumn("wp_4060", when(c1, col("wp_4060")))
        // trim_min_wh (wh_min=0.1) then trim_max_wh (wh_max=1.8)
        val d2 = Seq("wp_peak", "wh_4061", "wp_4060").foldLeft(d1)(
          (d, v) => d.withColumn(v, when(col("wh_4061") > 0.1, col(v))))
        val d3 = Seq("wp_peak", "wh_4061", "wp_4060").foldLeft(d2)(
          (d, v) => d.withColumn(v, when(col("wh_4061") < 1.8, col(v))))
        // trim_wp_ratio (ratio=1.15)
        val c4 = col("wp_peak") / col("wp_4060") < 1.15
        d3.withColumn("wp_peak", when(c4, col("wp_peak")))
          .withColumn("wp_4060", when(c4, col("wp_4060")))
          .select("event_id", "wp_peak", "wp_4060", "wh_4061")
      },
      Some("""WITH b AS (SELECT event_id, 2 + value/10 AS wp_peak,
             |    2 + value/12 AS wp_4060, value/50 AS wh_4061 FROM events),
             |t1 AS (SELECT event_id,
             |  CASE WHEN wp_peak < 8.0 AND wp_4060 < 8.0 THEN wp_peak END AS wp_peak,
             |  CASE WHEN wp_peak < 8.0 AND wp_4060 < 8.0 THEN wp_4060 END AS wp_4060,
             |  wh_4061 FROM b),
             |t2 AS (SELECT event_id,
             |  CASE WHEN wh_4061 > 0.1 THEN wp_peak END AS wp_peak,
             |  CASE WHEN wh_4061 > 0.1 THEN wp_4060 END AS wp_4060,
             |  CASE WHEN wh_4061 > 0.1 THEN wh_4061 END AS wh_4061 FROM t1),
             |t3 AS (SELECT event_id,
             |  CASE WHEN wh_4061 < 1.8 THEN wp_peak END AS wp_peak,
             |  CASE WHEN wh_4061 < 1.8 THEN wp_4060 END AS wp_4060,
             |  CASE WHEN wh_4061 < 1.8 THEN wh_4061 END AS wh_4061 FROM t2)
             |SELECT event_id,
             |  CASE WHEN wp_peak / wp_4060 < 1.15 THEN wp_peak END AS wp_peak,
             |  CASE WHEN wp_peak / wp_4060 < 1.15 THEN wp_4060 END AS wp_4060,
             |  wh_4061 FROM t3""".stripMargin)),

    // Vector point-velocity transform (stglib/core/transform.py): fixed
    // TransMatrix, per-row orientmat, orientation-down roll flip
    Q("vec_transform",
      (s, dir) => {
        val derived = Seq(
          "value * 3.6 as heading", "value / 12.5 - 4 as pitch",
          "cast(event_id % 2 as int) as orientation",
          "value / 10 - 5 + (case when event_id % 2 = 1 then 180.0 else 0.0 end) as roll_adj",
          "value / 100 - 0.5 as v1",
          "(cast(event_id % 101 as double) - 50) / 100 as v2",
          "(cast(event_id % 37 as double) - 18) / 100 as v3")
        val df = events(s, dir).selectExpr("event_id" +: derived: _*)
        val (u, v, w) = vecExprs
        df.selectExpr("event_id", s"round($u, 8) as u",
          s"round($v, 8) as v", s"round($w, 8) as w")
      },
      Some {
        val (u, v, w) = vecExprs
        s"""WITH b AS (SELECT event_id, value * 3.6 as heading,
           |  value / 12.5 - 4 as pitch,
           |  CAST(event_id % 2 AS INT) as orientation,
           |  value / 10 - 5 + (CASE WHEN event_id % 2 = 1 THEN 180.0 ELSE 0.0 END) as roll_adj,
           |  value / 100 - 0.5 as v1,
           |  (CAST(event_id % 101 AS DOUBLE) - 50) / 100 as v2,
           |  (CAST(event_id % 37 AS DOUBLE) - 18) / 100 as v3 FROM events)
           |SELECT event_id, round($u, 8) AS u, round($v, 8) AS v, round($w, 8) AS w
           |FROM b""".stripMargin
      }),

    // per-record 3×3 coordinate transform BEAM→ENU with per-row heading/
    // pitch/roll (stglib/aqd/aqdutils.py:133-214): R = H(hh)·P(pp,rr)·T,
    // expanded symbolically to closed-form expressions on both engines
    Q("coord_transform",
      (s, dir) => {
        val derived = Seq(
          "value * 3.6 as heading", "value / 10 - 5 as pitch",
          "value / 12.5 - 4 as roll", "value - 50 as v1",
          "cast(event_id % 101 as double) - 50 as v2",
          "cast(event_id % 37 as double) - 18 as v3")
        val df = events(s, dir).selectExpr("event_id" +: derived: _*)
        val (u, v, w) = coordExprs
        df.selectExpr("event_id", s"round($u, 8) as u",
          s"round($v, 8) as v", s"round($w, 8) as w")
      },
      Some {
        val (u, v, w) = coordExprs
        s"""WITH b AS (SELECT event_id, value * 3.6 as heading, value / 10 - 5 as pitch,
           |  value / 12.5 - 4 as roll, value - 50 as v1,
           |  cast(event_id % 101 as double) - 50 as v2,
           |  cast(event_id % 37 as double) - 18 as v3 FROM events)
           |SELECT event_id, round($u, 8) AS u, round($v, 8) AS v, round($w, 8) AS w
           |FROM b""".stripMargin
      })
  )

  /** Vector (point) BEAM→XYZ→ENU with per-row orientmat and the
    * orientation-down roll flip (stglib/core/transform.py:8-177):
    * ENU = H(hh)·P(pp,rr) · T · beam. */
  private lazy val vecExprs: (String, String, String) = {
    val T = Mat3.const(Array(
      Array(2.710, -1.409, -1.299),
      Array(0.071, 2.372, -2.442),
      Array(0.344, 0.344, 0.344)))
    val r = Mat3.mul(Mat3.mul(
      Mat3.heading("radians(heading - 90)"),
      Mat3.tilt("radians(pitch)", "radians(roll_adj)")), T)
    val Seq(u, v, w) = Mat3.apply3(r, Seq("v1", "v2", "v3"))
    (u, v, w)
  }

  /** Closed-form BEAM→ENU expressions shared verbatim by Spark and DuckDB.
    * T is a representative Nortek 3-beam geometry matrix (constant per
    * instrument config; stglib reads it from the .hdr file). */
  private lazy val coordExprs: (String, String, String) = {
    val T = Mat3.const(Array(
      Array(1.5774, -0.7891, -0.7891),
      Array(0.0, -1.3662, 1.3662),
      Array(0.3677, 0.3677, 0.3677)))
    val r = Mat3.mul(Mat3.mul(
      Mat3.heading("radians(heading - 90)"),
      Mat3.tilt("radians(pitch)", "radians(roll)")), T)
    val Seq(u, v, w) = Mat3.apply3(r, Seq("v1", "v2", "v3"))
    (u, v, w)
  }
}
