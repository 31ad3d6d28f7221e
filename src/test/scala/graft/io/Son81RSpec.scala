package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

class Son81RSpec extends AnyFunSuite {

  /** Build one 881A-GS ping record per the manual layout mirrored in
    * sonutils.py: 1024 header + 1024 device list + 40 switch + 32 return
    * header + echo bytes, padded to totalBytes. */
  private def ping(pingNum: Int, headPos: Int, stepDir: Int,
                   nData: Int, total: Int): Array[Byte] = {
    val rec = new Array[Byte](total)
    // ping header
    rec(0) = '8'; rec(1) = '1'; rec(2) = 'R'
    rec(3) = 1 // 881A-GS → 40/32 blocks
    ByteBuffer.wrap(rec, 4, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(total)
    "0320241230155".getBytes.copyToArray(rec, 14) // time string field
    rec(319) = 1 // orientation up
    rec(324) = 1 // polar mode
    ByteBuffer.wrap(rec, 338, 4).order(ByteOrder.LITTLE_ENDIAN).putFloat(1483.1f)
    ByteBuffer.wrap(rec, 373, 4).order(ByteOrder.LITTLE_ENDIAN).putFloat(0.02f)
    ByteBuffer.wrap(rec, 377, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(pingNum)
    // switch command at 2048
    val sw = 2048
    rec(sw + 11) = 70           // train angle 3*70-180 = 30
    rec(sw + 13) = 10           // step size 3.0 deg
    rec(sw + 19) = (nData / 10).toByte
    rec(sw + 25) = 100          // 675 kHz
    // return header at 2088
    val rh = sw + 40
    rec(rh + 5) = (headPos % 128).toByte
    rec(rh + 6) = ((headPos / 128) | (stepDir << 6)).toByte
    // echo data ramp
    val d0 = rh + 32
    for (i <- 0 until nData) rec(d0 + i) = (i % 256).toByte
    rec
  }

  test("decodes fixed-size ping records with bit-packed head position") {
    val total = 2048 + 40 + 32 + 500
    val stream = ping(1, 700, 0, 200, total) ++ ping(2, 710, 1, 200, total)
    val rows = Son81R.decode(stream).toList
    assert(rows.length == 2)
    val r0 = rows.head
    assert(r0.ping == 1 && r0.headPosition == 700)
    assert(math.abs(r0.headAngleDeg - (700 - 600) * 3.0) < 1e-9)
    assert(r0.stepDirection == 0 && rows(1).stepDirection == 1)
    // reference keeps offset:-1 — all bytes to totalBytes-1, not NDataPoints
    assert(r0.intensities.length == total - (2048 + 40 + 32) - 1)
    assert((r0.intensities(5) & 0xff) == 5)
    assert((r0.intensities(499 - 1) & 0xff) == 0) // padding beyond the ramp
    val h = Son81R.parsePingHeader(stream.take(1024))
    assert(h.orientationUp && h.mode == 1)
    assert(math.abs(h.soundVelocity - 1483.1f) < 1e-3)
  }

  test("RunOts .81R ingest: filename mmdd + header YYYYHHMMSS.f -> time") {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    val total = 2048 + 40 + 32 + 100
    val rec = ping(1, 700, 0, 50, total)
    "2024123015.50".getBytes.copyToArray(rec, 14)
    val dir = java.nio.file.Files.createTempDirectory("son81r").toFile
    val f = new java.io.File(dir, "dep_03150000.81R")
    java.nio.file.Files.write(f.toPath, rec)
    val out = new java.io.File(dir, "raw").getAbsolutePath
    graft.cli.RunOts.runStep(spark, "son", "ingest",
      graft.core.Meta(Map.empty[String, Any]), f.getAbsolutePath, out)
    val df = spark.read.parquet(out)
    assert(df.count() == 1)
    val t = df.collect()(0).getTimestamp(df.columns.indexOf("time"))
    assert(t.toInstant.toString == "2024-03-15T12:30:15.500Z")
  }
}
