package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** FLAC subset codec: CRC primitives against known vectors, container
  * golden bytes, lossless round trips across subframe types and
  * multi-frame streams, and strict corruption detection. */
class FlacSpec extends AnyFunSuite {

  test("CRC-8 (poly 0x07) and CRC-16 (poly 0x8005) match known vectors") {
    // "123456789" — the standard check string: CRC-8/ATM = 0xF4,
    // CRC-16/BUYPASS (poly 0x8005, init 0, no reflect) = 0xFEE8
    val msg = "123456789".getBytes("ASCII")
    assert(Flac.crc8(msg, 0, msg.length) == 0xF4)
    assert(Flac.crc16(msg, 0, msg.length) == 0xFEE8)
  }

  test("container golden bytes: magic, STREAMINFO fields, frame sync") {
    val pcm = Array.tabulate(32)(i => (i * 100 - 1600).toShort)
    val a = Flac.encode(pcm, 44100, blockSize = 32)
    assert(new String(a, 0, 4, "ASCII") == "fLaC")
    // metadata header: last-block | type 0, length 34
    assert((a(4) & 0xff) == 0x80 && a(5) == 0 && a(6) == 0 && (a(7) & 0xff) == 34)
    // STREAMINFO: min/max blocksize = 32
    assert(((a(8) & 0xff) << 8 | (a(9) & 0xff)) == 32)
    assert(((a(10) & 0xff) << 8 | (a(11) & 0xff)) == 32)
    // sample rate 44100 in the top 20 bits of bytes 18..20
    val sr = ((a(18) & 0xff) << 12) | ((a(19) & 0xff) << 4) | ((a(20) & 0xff) >> 4)
    assert(sr == 44100)
    // channels-1 = 0 (3 bits), bps-1 = 15 (5 bits) → byte 20 low nibble + byte 21
    assert(((a(20) >> 1) & 0x7) == 0)
    assert((((a(20) & 0x1) << 4) | ((a(21) & 0xff) >> 4)) == 15)
    // first frame begins with the 14-bit sync code
    assert((a(42) & 0xff) == 0xFF && ((a(43) & 0xff) >> 2) == 0x3E)
  }

  test("round trips: constant, verbatim-short, fixed, multi-frame, extremes") {
    val cases = Seq(
      Array.fill(64)(0.toShort),                       // constant zero
      Array.fill(64)(-12345.toShort),                  // constant negative
      Array.tabulate(500)(i => (math.sin(i / 7.0) * 12000).toShort),
      Array.tabulate(10000)(i => ((i * 1103515245 + 12345) % 30000).toShort),
      Array[Short](32767, -32768, 0, 1, -1, 32767, -32768, 100, -100,
        32767, -32768, 5, 6, 7, 8, 9))
    for ((pcm, ci) <- cases.zipWithIndex) {
      val enc = Flac.encode(pcm, 8000, blockSize = 256)
      val (sr, got) = Flac.decode(enc)
      assert(sr == 8000 && got.sameElements(pcm), s"case $ci")
    }
  }

  test("compression actually happens on smooth signals") {
    val pcm = Array.tabulate(8000)(i => (math.sin(i / 50.0) * 8000).toShort)
    val enc = Flac.encode(pcm, 8000)
    assert(enc.length < pcm.length * 2 * 6 / 10,
      s"FLAC ${enc.length} bytes vs raw ${pcm.length * 2} — no compression?")
  }

  test("stereo left/side round-trips losslessly, incl. anti-correlated channels") {
    val n = 3000
    val left = Array.tabulate(n)(i => (math.sin(i / 20.0) * 10000).toShort)
    // highly correlated right (small offset) AND a hard case appended:
    // perfectly anti-correlated channels blow the side up to 17 bits
    val right = Array.tabulate(n)(i => (math.sin(i / 20.0) * 10000 - 37).toShort)
    val enc = Flac.encodeStereo(left, right, 44100, blockSize = 512)
    val (sr, l2, r2) = Flac.decodeStereo(enc)
    assert(sr == 44100 && l2.sameElements(left) && r2.sameElements(right))
    val anti = Array[Short](32767, -32768, 32767, -32768, 20000, -20000,
      32767, -32768, 1, -1, 32767, -32768, 5, -5, 9, -9)
    val encA = Flac.encodeStereo(anti, anti.map(v => (-v - 1).toShort), 8000)
    val (_, la, ra) = Flac.decodeStereo(encA)
    assert(la.sameElements(anti) && ra.sameElements(anti.map(v => (-v - 1).toShort)))
    // correlated stereo should compress well below raw
    assert(enc.length < n * 4 * 6 / 10, s"stereo ${enc.length} vs raw ${n * 4}")
  }

  test("corruption anywhere is detected, never garbage or a hang") {
    val pcm = Array.tabulate(300)(i => ((i * 37) % 4000 - 2000).toShort)
    val enc = Flac.encode(pcm, 8000, blockSize = 128)
    val rnd = new scala.util.Random(3)
    var caught = 0
    for (_ <- 0 until 60) {
      val bad = enc.clone()
      val p = rnd.nextInt(bad.length)
      bad(p) = (bad(p) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val (_, got) = Flac.decode(bad)
        // a flip the CRCs can't see must at least not corrupt silently…
        if (!got.sameElements(pcm)) fail(s"silent corruption at byte $p")
      } catch { case _: Exception => caught += 1 }
    }
    assert(caught > 40, s"only $caught/60 flips detected — CRC gates too weak")
    // truncation
    intercept[Exception](Flac.decode(enc.take(enc.length - 3)))
    intercept[Exception](Flac.decode(enc.take(30)))
  }
}
