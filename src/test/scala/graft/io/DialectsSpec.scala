package graft.io

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DialectsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[2]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("Marotte csv: title line skipped, 9 fixed columns, timestamp parse") {
    val csv = """MAROTTE HS title line, ignore
                |2024-03-01 00:00:00,0.12,184.2,0.15,0.09,12.1,185.0,3.61,18.4
                |2024-03-01 00:00:01,0.13,184.9,0.16,0.10,12.0,185.5,3.61,18.4
                |""".stripMargin
    val df = Dialects.readMarotte(spark, csv)
    assert(df.count() == 2)
    val r = df.orderBy("time").collect()(0)
    assert(r.getTimestamp(0).toInstant.toString == "2024-03-01T00:00:00Z")
    assert(r.getDouble(df.columns.indexOf("speed")) == 0.12)
    assert(r.getDouble(df.columns.indexOf("temp")) == 18.4)
  }

  test("Geolux TOA5: names row, units/agg rows dropped, RECORD int") {
    val dat = Seq(
      "\"TOA5\",\"glx\",\"CR1000X\",\"12345\"",
      "\"TIMESTAMP\",\"RECORD\",\"distance\",\"amplitude\"",
      "\"TS\",\"RN\",\"m\",\"dB\"",
      "\"\",\"\",\"Smp\",\"Smp\"",
      "\"2024-03-01 00:00:00\",10,4.512,61.2",
      "\"2024-03-01 00:00:01\",11,4.513,60.8").mkString("\n")
    val df = Dialects.readGeolux(spark, dat)
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("time", "RECORD", "distance", "amplitude"))
    val r = df.orderBy("time").collect()(1)
    assert(r.getLong(df.columns.indexOf("RECORD")) == 11L)
    assert(r.getDouble(df.columns.indexOf("distance")) == 4.513)
    assert(r.getTimestamp(df.columns.indexOf("time")).toInstant.toString ==
      "2024-03-01T00:00:01Z")
  }
}
