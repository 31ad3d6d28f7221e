package graft.io

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class Netcdf3Spec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[2]")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("write + read round trip with attrs, nulls and mixed types") {
    import spark.implicits._
    val df = Seq(
      (0.0, 10.5f, 1, Option(5.0)),
      (1.0, 11.5f, 2, None),
      (2.0, 12.5f, 3, Option(7.25)))
      .toDF("time", "P_1", "sample", "T_28")
      .selectExpr("time", "P_1", "sample", "T_28")
    val path = Files.createTempDirectory("nc3").resolve("out.nc").toString
    val n = Netcdf3.write(df, path,
      attrs = Seq("Conventions" -> "CF-1.8", "title" -> "graft test"),
      varAttrs = Map(
        "time" -> Seq("units" -> "seconds since 2024-01-01"),
        "P_1" -> Seq("units" -> "dbar", "long_name" -> "pressure")))
    assert(n == 3)
    val nc = Netcdf3.read(Files.readAllBytes(Paths.get(path)))
    assert(nc.numrecs == 3)
    assert(nc.dims == Seq("time" -> 0)) // unlimited
    assert(nc.attrs("Conventions") == "CF-1.8")
    assert(nc.vars.map(_.name) == Seq("time", "P_1", "sample", "T_28"))
    assert(nc.vars(1).attrs("units") == "dbar")
    assert(nc.column("time").toSeq == Seq(0.0, 1.0, 2.0))
    assert(nc.column("P_1").toSeq == Seq(10.5, 11.5, 12.5))
    assert(nc.column("sample").toSeq == Seq(1.0, 2.0, 3.0))
    val t28 = nc.column("T_28")
    assert(t28(0) == 5.0 && t28(1).isNaN && t28(2) == 7.25)
  }

  test("CDF-5: round trip with 64-bit fields and native NC_INT64") {
    import spark.implicits._
    val df = Seq(
      (0.0, 10.5f, 5_000_000_000L, Option(5.0)),
      (1.0, 11.5f, -3L, None),
      (2.0, 12.5f, 9_007_199_254_740_993L, Option(7.25))) // > 2^53: doubles can't hold it
      .toDF("time", "P_1", "sample64", "T_28")
    val path = Files.createTempDirectory("nc5").resolve("out.nc").toString
    val n = Netcdf3.write(df, path,
      attrs = Seq("Conventions" -> "CF-1.8"),
      varAttrs = Map("P_1" -> Seq("units" -> "dbar")),
      version = 5)
    assert(n == 3)
    val b = Files.readAllBytes(Paths.get(path))
    assert(b(0) == 'C' && b(1) == 'D' && b(2) == 'F' && b(3) == 5)
    val nc = Netcdf3.read(b)
    assert(nc.header.version == 5 && nc.numrecs == 3)
    assert(nc.attrs("Conventions") == "CF-1.8")
    assert(nc.vars(1).attrs("units") == "dbar")
    assert(nc.vars(2).ncType == 10) // NC_INT64, not a lossy double
    assert(nc.column("time").toSeq == Seq(0.0, 1.0, 2.0))
    assert(nc.column("P_1").toSeq == Seq(10.5, 11.5, 12.5))
    // int64 exactness: read the raw longs back via the seek reader
    val h = Netcdf3.open(path)
    val raf = new java.io.RandomAccessFile(path, "r")
    val v = h.vars.find(_.name == "sample64").get
    val longs = (0 until 3).map { r =>
      raf.seek(v.begin + r.toLong * h.recSize); raf.readLong() }
    raf.close()
    assert(longs == Seq(5_000_000_000L, -3L, 9_007_199_254_740_993L))
  }

  test("CDF-5: begin offsets past 2^31 round-trip (sparse header pad)") {
    import spark.implicits._
    val df = Seq((0.0, 1.5), (1.0, 2.5), (2.0, 3.5)).toDF("time", "P_1")
    val dir = Files.createTempDirectory("nc5big")
    val path = dir.resolve("big.nc").toString
    val pad = 3_000_000_000L // data starts past the 32-bit offset horizon
    Netcdf3.write(df, path, version = 5, headerPad = pad)
    assert(new java.io.File(path).length() > pad) // sparse: a hole, not bytes
    val h = Netcdf3.open(path) // bounded prefix read — never loads the 3 GB
    assert(h.vars.forall(_.begin > Int.MaxValue.toLong))
    assert(h.numrecs == 3)
    assert(Netcdf3.columnAt(path, h, "time").toSeq == Seq(0.0, 1.0, 2.0))
    assert(Netcdf3.columnAt(path, h, "P_1").toSeq == Seq(1.5, 2.5, 3.5))
    // CDF-1 must refuse what it cannot address, not write a corrupt header
    val e = intercept[IllegalArgumentException] {
      Netcdf3.write(df, dir.resolve("bad.nc").toString, version = 1, headerPad = pad)
    }
    assert(e.getMessage.contains("version = 5"))
    Files.deleteIfExists(Paths.get(path))
  }

  test("header layout: known magic and classic tags at fixed offsets") {
    import spark.implicits._
    val df = Seq((0.0, 1.0)).toDF("time", "v")
    val path = Files.createTempDirectory("nc3").resolve("hdr.nc").toString
    Netcdf3.write(df, path)
    val b = Files.readAllBytes(Paths.get(path))
    assert(b(0) == 'C' && b(1) == 'D' && b(2) == 'F' && b(3) == 1)
    // numrecs patched to 1
    assert(((b(4) & 0xff) << 24 | (b(5) & 0xff) << 16 |
      (b(6) & 0xff) << 8 | (b(7) & 0xff)) == 1)
    // NC_DIMENSION tag follows
    assert(b(11) == 0x0a)
  }
}
