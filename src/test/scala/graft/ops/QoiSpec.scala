package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** QOI codec invariants: hand-computed golden bytes for each op family,
  * exhaustive-ish randomized round trips (RGB and RGBA), run-length
  * boundary cases, and strict malformed-stream rejection. */
class QoiSpec extends AnyFunSuite {

  private def rgba(pxs: (Int, Int, Int, Int)*): Array[Byte] =
    pxs.flatMap { case (r, g, b, a) => Seq(r, g, b, a) }.map(_.toByte).toArray

  test("golden stream: RGBA, DIFF, RUN, INDEX, LUMA ops byte-for-byte") {
    // 6x1 RGBA image: first pixel forces RGBA (alpha 128 != 255); second
    // +1/+1/+1 is DIFF; third repeats (RUN 1); fourth returns to pixel 1's
    // color -> INDEX; fifth jumps +10 on all channels -> LUMA; sixth
    // repeats -> trailing RUN.
    val p1 = (10, 20, 30, 128); val p2 = (11, 21, 31, 128)
    val p5 = (20, 30, 40, 128)
    val px = rgba(p1, p2, p2, p1, p5, p5)
    val enc = Qoi.encode(6, 1, 4, px)
    val hdr = Array[Byte]('q', 'o', 'i', 'f',
      0, 0, 0, 6, 0, 0, 0, 1, 4, 0)
    val h1 = (10 * 3 + 20 * 5 + 30 * 7 + 128 * 11) % 64
    val body = Array[Int](
      0xff, 10, 20, 30, 128,            // RGBA
      0x40 | (3 << 4) | (3 << 2) | 3,   // DIFF +1,+1,+1
      0xc0,                             // RUN 1
      h1,                               // INDEX back to p1
      0x80 | (10 + 32), ((10 - 10 + 8) << 4) | (10 - 10 + 8), // LUMA dg=10
      0xc0                              // trailing RUN 1
    ).map(_.toByte)
    val marker = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)
    assert(enc.toSeq == (hdr ++ body ++ marker).toSeq,
      s"got ${enc.map(b => b & 0xff).mkString(",")}")
    val (w, h, c, got) = Qoi.decode(enc)
    assert(w == 6 && h == 1 && c == 4 && got.toSeq == px.toSeq)
  }

  test("randomized round trips, RGB and RGBA, varied entropy") {
    val rnd = new Random(42)
    for (trial <- 0 until 30) {
      val w = 1 + rnd.nextInt(17); val h = 1 + rnd.nextInt(9)
      val ch = if (trial % 2 == 0) 3 else 4
      // low-entropy palettes exercise RUN/INDEX; high-entropy exercises
      // RGB/RGBA/LUMA
      val palette = Array.fill(1 + rnd.nextInt(6))(
        Array.fill(ch)(rnd.nextInt(256).toByte))
      val px = new Array[Byte](w * h * ch)
      for (i <- 0 until w * h) {
        val p =
          if (rnd.nextBoolean()) palette(rnd.nextInt(palette.length))
          else Array.fill(ch)(rnd.nextInt(256).toByte)
        System.arraycopy(p, 0, px, i * ch, ch)
      }
      val (gw, gh, gc, got) = Qoi.decode(Qoi.encode(w, h, ch, px))
      assert(gw == w && gh == h && gc == ch, s"trial $trial dims")
      assert(got.toSeq == px.toSeq, s"trial $trial ${w}x$h ch=$ch not lossless")
    }
  }

  test("long runs split at 62 and a full-image run round-trips") {
    for (n <- Seq(61, 62, 63, 124, 200)) {
      val px = Array.fill(n * 3)(77.toByte)
      val (w, _, _, got) = Qoi.decode(Qoi.encode(n, 1, 3, px))
      assert(w == n && got.toSeq == px.toSeq, s"run length $n")
    }
  }

  test("malformed streams throw") {
    val ok = Qoi.encode(3, 2, 4, Array.fill(24)(5.toByte))
    assert(intercept[IllegalArgumentException](
      Qoi.decode(ok.take(10))).getMessage.contains("truncated"))
    val badMagic = ok.clone(); badMagic(0) = 'x'
    assert(intercept[IllegalArgumentException](
      Qoi.decode(badMagic)).getMessage.contains("not a QOI"))
    val badMarker = ok.clone(); badMarker(badMarker.length - 1) = 0
    assert(intercept[IllegalArgumentException](
      Qoi.decode(badMarker)).getMessage.contains("end marker"))
    val truncated = ok.dropRight(9) ++ Array.fill[Byte](7)(0) :+ 1.toByte
    intercept[IllegalArgumentException](Qoi.decode(truncated))
    assert(intercept[IllegalArgumentException](
      Qoi.encode(2, 2, 5, new Array[Byte](20))).getMessage.contains("channels"))
  }

  test("decoder state (color table, prev pixel) matches across op mix") {
    // worst-case stress: every pixel differs from prev by a LUMA-range
    // delta so the table fills with 64+ distinct colors and INDEX ops must
    // resolve against the live table, not a stale one
    val n = 300
    val px = new Array[Byte](n * 3)
    var v = 0
    for (i <- 0 until n) {
      v = (v + 7) % 256
      px(i * 3) = v.toByte; px(i * 3 + 1) = ((v + 3) % 256).toByte
      px(i * 3 + 2) = ((v + 200) % 256).toByte
    }
    val (_, _, _, got) = Qoi.decode(Qoi.encode(n, 1, 3, px))
    assert(got.toSeq == px.toSeq)
  }
}
