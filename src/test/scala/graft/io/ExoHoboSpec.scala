package graft.io

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExoHoboSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("EXO: header block skipped, casing normalized, date+time merged") {
    val f = java.io.File.createTempFile("exo", ".csv")
    val w = new java.io.PrintWriter(f)
    (1 to 8).foreach(i => w.println(s"KOR export metadata line $i"))
    w.println("Date (MM/DD/YYYY),Time (HH:mm:ss),Temp °C,SpCond µS/cm,Turbidity FNU")
    w.println("1/15/2024,0:00:00,21.31,48012.2,3.4")
    w.println("1/15/2024,0:15:00,21.35,48013.8,3.6")
    w.close()
    val df = Readers.readExoCsv(spark, f.getAbsolutePath)
    assert(df.count() == 2)
    assert(df.columns.contains("time"))
    assert(df.columns.exists(_.startsWith("temp")))
    val r = df.orderBy("time").head()
    assert(r.getTimestamp(df.columns.indexOf("time")).toInstant.toString
      == "2024-01-15T00:00:00Z")
  }

  test("EXO: data scan is splittable — no single-task file bound (wholetext is gone)") {
    val f = java.io.File.createTempFile("exobig", ".csv")
    val w = new java.io.PrintWriter(f)
    (1 to 8).foreach(i => w.println(s"KOR export metadata line $i"))
    w.println("Date (MM/DD/YYYY),Time (HH:mm:ss),Temp °C")
    for (i <- 0 until 500) {
      val mm = i % 60; val hh = (i / 60) % 24
      w.println(f"1/15/2024,$hh%d:$mm%02d:00,${20.0 + (i % 17) * 0.1}%.1f")
    }
    w.close()
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    try {
      val df = Readers.readExoCsv(spark, f.getAbsolutePath)
      assert(df.rdd.getNumPartitions > 1, "text scan should split the file")
      assert(df.count() == 500)
      assert(df.select("time").distinct().count() == 500) // every line parsed
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("HOBO: title row skipped, kPa -> dbar, EPIC renames") {
    val f = java.io.File.createTempFile("hobo", ".csv")
    val w = new java.io.PrintWriter(f)
    w.println("Plot Title: 10973214 logger")
    w.println("#,Date Time,Abs Pres,Temp")
    w.println("1,01/15/24 12:00:00 AM,101.325,21.5")
    w.println("2,01/15/24 12:15:00 AM,101.300,21.4")
    w.close()
    val df = Readers.readHoboCsv(spark, f.getAbsolutePath)
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("time", "AbsPres_dbar", "T_28"))
    val r = df.orderBy("time").head()
    assert(math.abs(r.getAs[Double]("AbsPres_dbar") - 10.1325) < 1e-9)
    assert(r.getAs[Double]("T_28") == 21.5)
  }
}
