package graft.io

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream

/** Synthesizes valid PD0 ensembles byte-for-byte per the TRDI layout
  * (mirroring stglib/rdi/rdiadcpy.py offsets) and round-trips the decoder. */
class Pd0Spec extends AnyFunSuite {

  private def u16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def i16(v: Int): Array[Byte] = u16(v & 0xffff)

  /** Build one ensemble: header + fixed leader + variable leader + velocity
    * + correlation + echo, with a correct trailing checksum. */
  private def ensemble(ensNum: Int, ncells: Int, nbeams: Int,
                       velFn: (Int, Int) => Int): Array[Byte] = {
    val fixed = new ByteArrayOutputStream()
    fixed.write(u16(0x0000)) // fixed leader id
    fixed.write(Array.fill(6)(0.toByte)) // cpu version etc (bytes 2-7)
    fixed.write(nbeams); fixed.write(ncells)
    fixed.write(i16(1))      // pings per ensemble
    fixed.write(i16(100))    // cell length cm
    fixed.write(i16(50))     // blank cm
    fixed.write(Array.fill(16)(0.toByte)) // bytes 17-32
    fixed.write(i16(160))    // bin 1 distance cm (offset 32)
    fixed.write(Array.fill(8)(0.toByte))
    val fl = fixed.toByteArray

    val vari = new ByteArrayOutputStream()
    vari.write(u16(0x0080))
    vari.write(u16(ensNum))
    vari.write(24); vari.write(3); vari.write(15) // 2024-03-15
    vari.write(12); vari.write(30); vari.write(45); vari.write(50) // 12:30:45.50
    vari.write(0) // ensemble MSB
    vari.write(Array.fill(2)(0.toByte)) // BIT results (bytes 12-13)
    vari.write(u16(1500)) // speed of sound
    vari.write(u16(105))  // transducer depth, dm
    vari.write(u16(12345)) // heading, hundredths
    vari.write(i16(-250))  // pitch
    vari.write(i16(150))   // roll
    vari.write(u16(35))    // salinity
    vari.write(i16(2150))  // temperature, hundredths degC
    vari.write(Array.fill(20)(0.toByte))
    val vl = vari.toByteArray

    val velb = new ByteArrayOutputStream()
    velb.write(u16(0x0100))
    for (c <- 0 until ncells; b <- 0 until nbeams) velb.write(i16(velFn(c, b)))
    val vd = velb.toByteArray

    val corb = new ByteArrayOutputStream()
    corb.write(u16(0x0200))
    for (c <- 0 until ncells; b <- 0 until nbeams) corb.write(100 + c + b)
    val cd = corb.toByteArray

    val echob = new ByteArrayOutputStream()
    echob.write(u16(0x0300))
    for (c <- 0 until ncells; b <- 0 until nbeams) echob.write(60 + c)
    val ed = echob.toByteArray

    val ndt = 5
    val headerLen = 6 + 2 * ndt
    val blocks = Seq(fl, vl, vd, cd, ed)
    val offsets = blocks.scanLeft(headerLen)((acc, b) => acc + b.length).init
    val nbytes = headerLen + blocks.map(_.length).sum

    val out = new ByteArrayOutputStream()
    out.write(0x7f); out.write(0x7f)
    out.write(u16(nbytes))
    out.write(0) // spare
    out.write(ndt)
    offsets.foreach(o => out.write(u16(o)))
    blocks.foreach(b => out.write(b))
    val body = out.toByteArray
    require(body.length == nbytes, s"${body.length} != $nbytes")
    val checksum = body.foldLeft(0)((s, b) => (s + (b & 0xff)) & 0xffff)
    body ++ u16(checksum)
  }

  test("decodes a two-ensemble stream: geometry, time, sensors, velocities") {
    val e1 = ensemble(1, ncells = 4, nbeams = 4, (c, b) => 100 * c + 10 * b)
    val e2 = ensemble(2, ncells = 4, nbeams = 4,
      (c, b) => if (c == 3) -32768 else -(100 * c + 10 * b))
    val rows = Pd0.decode(e1 ++ e2).toList
    assert(rows.length == 8)
    val r0 = rows.head
    assert(r0.ensemble == 1 && r0.bin == 0)
    assert(r0.bindistM == 1.6)
    assert(rows(1).bindistM == 2.6) // +1 m cell length
    assert(r0.vel1.contains(0) && r0.vel2.contains(10) && r0.vel4.contains(30))
    assert(r0.headingDeg == 123.45 && r0.pitchDeg == -2.5 && r0.rollDeg == 1.5)
    assert(r0.temperatureC == 21.5 && r0.xducerDepthM == 10.5)
    assert(java.time.Instant.ofEpochMilli(r0.timeUs / 1000).toString
      == "2024-03-15T12:30:45.500Z")
    assert(r0.cor1 == 100 && r0.echo1 == 60)
    // bad-value sentinel → None
    val e2bad = rows.filter(r => r.ensemble == 2 && r.bin == 3)
    assert(e2bad.head.vel1.isEmpty && e2bad.head.vel2.isEmpty)
  }

  test("resyncs past garbage and rejects corrupt checksums") {
    val good = ensemble(7, 2, 4, (c, b) => c + b)
    val garbage = Array[Byte](0x12, 0x7f, 0x00, 0x33)
    val corrupt = good.clone(); corrupt(10) = (corrupt(10) ^ 0xff).toByte
    val rows = Pd0.decode(garbage ++ corrupt ++ good).toList
    assert(rows.map(_.ensemble).distinct == List(7))
    assert(rows.length == 2)
  }

  test("Spark binaryFile integration: file -> long-format DataFrame") {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("pd0").toFile
    val f = new java.io.File(dir, "deploy.pd0")
    val os = new java.io.FileOutputStream(f)
    (1 to 5).foreach(i => os.write(ensemble(i, 3, 4, (c, b) => i * 10 + c)))
    os.close()
    val df = Pd0.read(spark, f.getAbsolutePath)
    assert(df.count() == 15)
    assert(df.columns.contains("bindistM") && df.columns.contains("vel1"))
    val ens = df.select("ensemble").distinct().count()
    assert(ens == 5)
  }
}
