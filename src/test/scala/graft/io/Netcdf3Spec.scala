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
