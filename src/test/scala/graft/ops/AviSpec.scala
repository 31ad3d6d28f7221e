package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** AVI DIB-frame codec — real RIFF-tree walking and frame grammar. */
class AviSpec extends AnyFunSuite {

  private def synth(w: Int, h: Int, n: Int, seed: Int): Array[Array[Byte]] =
    Array.tabulate(n) { f =>
      Array.tabulate(w * h * 3)(i => ((seed * 31 + f * 13 + i * 7) % 256).toByte)
    }

  test("encode → decode round-trips dims and every frame (padded rows)") {
    val w = 6; val h = 4 // stride 20 → 2 pad bytes per row, load-bearing
    val frames = synth(w, h, 3, seed = 9)
    val bytes = Multimodal.encodeAviDib(w, h, frames, fps = 25)
    val (gw, gh, got) = Multimodal.decodeAviDib(bytes)
    assert(gw == w && gh == h && got.length == 3)
    got.zip(frames).foreach { case (g, e) => assert(g.toSeq == e.toSeq) }
  }

  test("round-trips with zero DIB padding (width multiple of 4)") {
    val w = 4; val h = 2
    val frames = synth(w, h, 2, seed = 3)
    val (gw, gh, got) = Multimodal.decodeAviDib(
      Multimodal.encodeAviDib(w, h, frames, fps = 30))
    assert(gw == w && gh == h && got.length == 2)
    got.zip(frames).foreach { case (g, e) => assert(g.toSeq == e.toSeq) }
  }

  test("decoder skips foreign chunks (JUNK inside the RIFF tree)") {
    val w = 4; val h = 2
    val frames = synth(w, h, 1, seed = 5)
    val base = Multimodal.encodeAviDib(w, h, frames, fps = 25)
    // splice an odd-sized JUNK chunk between hdrl and movi (hdrl LIST
    // spans 12 .. 12+8+192 = 212); RIFF pads odd bodies to even length
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 0)
    val at = 212
    val spliced = base.slice(0, at) ++ junk ++ base.slice(at, base.length)
    val total = spliced.length - 8
    for (j <- 0 until 4) spliced(4 + j) = ((total >> (8 * j)) & 0xff).toByte
    val (gw, gh, got) = Multimodal.decodeAviDib(spliced)
    assert(gw == w && gh == h && got.length == 1)
    assert(got(0).toSeq == frames(0).toSeq)
  }

  test("malformed input throws instead of hanging or OOB-reading") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeAviDib("not a video container!!!".getBytes)
    }
    val base = Multimodal.encodeAviDib(4, 2, synth(4, 2, 1, 1), fps = 25)
    // wrapped-negative chunk size on the hdrl LIST (bytes 16-19)
    val neg = base.clone()
    for (j <- 0 until 4) neg(16 + j) = 0xff.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeAviDib(neg) }
    // truncated mid-frame: size field of 00db points past the buffer
    val cut = base.slice(0, base.length - 4)
    intercept[IllegalArgumentException] { Multimodal.decodeAviDib(cut) }
    // compressed stream rejected (biCompression != 0 in strf)
    val comp = base.clone()
    comp(12 + 8 + 4 + 64 + 12 + 64 + 8 + 16) = 1 // strf data + biCompression
    intercept[IllegalArgumentException] { Multimodal.decodeAviDib(comp) }
  }

  test("nested-LIST bomb throws (depth cap) instead of overflowing the stack") {
    def p32(v: Long): Array[Byte] =
      Array.tabulate(4)(j => ((v >> (8 * j)) & 0xff).toByte)
    // innermost payload, wrapped in 40 nested LISTs
    var body = Array[Byte]()
    for (_ <- 0 until 40)
      body = "LIST".getBytes("US-ASCII") ++ p32(4L + body.length) ++
        "nest".getBytes("US-ASCII") ++ body
    val bomb = "RIFF".getBytes("US-ASCII") ++ p32(4L + body.length) ++
      "AVI ".getBytes("US-ASCII") ++ body
    intercept[IllegalArgumentException] { Multimodal.decodeAviDib(bomb) }
  }

  test("huge header dims fail the frame bounds check, no overflow/allocation") {
    val base = Multimodal.encodeAviDib(4, 2, synth(4, 2, 1, 1), fps = 25)
    val huge = base.clone()
    // avih body starts at 32; dwWidth at +32, dwHeight at +36
    val w = 0x40000000L
    for (j <- 0 until 4) huge(64 + j) = ((w >> (8 * j)) & 0xff).toByte
    intercept[IllegalArgumentException] { Multimodal.decodeAviDib(huge) }
  }
}
