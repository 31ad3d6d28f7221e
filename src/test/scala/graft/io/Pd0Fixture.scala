package graft.io

import java.io.ByteArrayOutputStream

/** Shared test scaffolding: synthesizes valid PD0 ensembles byte-for-byte
  * per the TRDI layout (mirroring stglib/rdi/rdiadcpy.py offsets), including
  * percent-good (0x0400) and bottom-track (0x0600) blocks. */
object Pd0Fixture {

  def u16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  def i16(v: Int): Array[Byte] = u16(v & 0xffff)

  /** Build one ensemble: header + fixed leader + variable leader + velocity
    * + correlation + echo + percent good + bottom track, with a correct
    * trailing checksum. */
  def ensemble(ensNum: Int, ncells: Int, nbeams: Int,
               velFn: (Int, Int) => Int,
               pgFn: (Int, Int) => Int = (c, b) => 90 + b,
               btRangeCm: Int => Int = b => 1200 + 10 * b,
               btVelMms: Int => Int = b => -50 + 5 * b): Array[Byte] = {
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

    val pgb = new ByteArrayOutputStream()
    pgb.write(u16(0x0400))
    for (c <- 0 until ncells; b <- 0 until nbeams) pgb.write(pgFn(c, b))
    val pd = pgb.toByteArray

    // bottom track: range LSB i16 cm at +16, velocity i16 mm/s at +24
    // (rdiadcpy.py:1844-1920); intervening bytes zeroed
    val btb = new ByteArrayOutputStream()
    btb.write(u16(0x0600))
    btb.write(Array.fill(14)(0.toByte)) // bytes 2-15
    for (b <- 0 until 4) btb.write(i16(if (b < nbeams) btRangeCm(b) else -32768))
    for (b <- 0 until 4) btb.write(i16(if (b < nbeams) btVelMms(b) else -32768))
    btb.write(Array.fill(49)(0.toByte)) // through byte 80
    val bt = btb.toByteArray

    // V-series vertical beam: leader (0x0F01) + velocity/correlation/
    // amplitude blocks with their own cell count (= ncells here)
    val vbl = new ByteArrayOutputStream()
    vbl.write(u16(0x0F01))
    vbl.write(u16(ncells)) // Vertical_Depth_Cells
    vbl.write(u16(1)); vbl.write(u16(100)); vbl.write(u16(160))
    val vblB = vbl.toByteArray
    val vv = new ByteArrayOutputStream()
    vv.write(u16(0x0A00))
    for (c <- 0 until ncells) vv.write(i16(500 + c))
    val vvB = vv.toByteArray
    val vc = new ByteArrayOutputStream()
    vc.write(u16(0x0B00))
    for (c <- 0 until ncells) vc.write(80 + c)
    val vcB = vc.toByteArray
    val ve = new ByteArrayOutputStream()
    ve.write(u16(0x0C00))
    for (c <- 0 until ncells) ve.write(40 + c)
    val veB = ve.toByteArray
    val vg = new ByteArrayOutputStream()
    vg.write(u16(0x0D00))
    for (c <- 0 until ncells) vg.write(95 - c)
    val vgB = vg.toByteArray

    // instrument transformation matrix: 3 axes × nbeams raw i16
    // (rdiadcpy.py:1497-1527); values ±14619 ≈ ±1.4619 in TRDI scaling
    val xm = new ByteArrayOutputStream()
    xm.write(u16(0x3200))
    for (a <- 0 until 3; b <- 0 until nbeams)
      xm.write(i16(if (a == 0) 14619 else 1000 * a + b))
    val xmB = xm.toByteArray

    val blocks = Seq(fl, vl, vd, cd, ed, pd, bt, vblB, vvB, vcB, veB, vgB, xmB)
    val ndt = blocks.length
    val headerLen = 6 + 2 * ndt
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
}
