package graft.io

import graft.core.Meta
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ComplianceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("compliant CF table passes") {
    val f = java.io.File.createTempFile("cftest", ".csv")
    val w = new java.io.PrintWriter(f)
    w.println("time,Pressure,Temperature")
    w.println("2024-01-01 00:00:00,10.1,21.0")
    w.println("2024-01-01 00:00:01,10.2,21.1")
    w.close()
    val df = Readers.readInstrumentCsv(spark, f.getAbsolutePath, Meta.empty)
    assert(Compliance.check(df).isEmpty)
  }

  test("violations reported: non-monotone time, missing metadata") {
    import spark.implicits._
    val df = Seq(
      ("2024-01-01 00:00:01", 1.0), ("2024-01-01 00:00:01", 2.0))
      .toDF("time", "raw_sensor")
      .withColumn("time", org.apache.spark.sql.functions.col("time").cast("timestamp"))
    val v = Compliance.check(df)
    assert(v.exists(_.rule == "time-monotone"))
    assert(v.exists(_.rule == "var-units"))
    assert(v.exists(_.rule == "var-standard-name"))
  }
}
