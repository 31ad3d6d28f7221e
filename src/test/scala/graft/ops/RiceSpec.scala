package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Rice/Shorten residual codec invariants: lossless round trip across k,
  * genuine compression on smooth signals, bit-offset bookkeeping, and
  * strict malformed-input behavior (throw, never hang). */
class RiceSpec extends AnyFunSuite {

  test("lossless round trip over randomized signals for k in 0..12") {
    val rnd = new scala.util.Random(42)
    for (k <- Seq(0, 1, 4, 8, 12); trial <- 0 until 5) {
      // random walk keeps residuals small but sign-varied; spikes included
      var x = rnd.nextInt(2000) - 1000
      val pcm = Array.tabulate(200) { i =>
        x += rnd.nextInt(101) - 50
        if (i % 37 == 0) x += rnd.nextInt(4001) - 2000 // spike
        x = math.max(-32768, math.min(32767, x))
        x.toShort
      }
      val (kGot, got, offs, lens) = Multimodal.decodeRice(Multimodal.encodeRice(pcm, k))
      assert(kGot == k && got.sameElements(pcm), s"k=$k trial=$trial")
      // offsets are exactly cumulative lengths
      offs.zip(lens).zipWithIndex.foreach { case ((o, l), j) =>
        if (j > 0) assert(o == offs(j - 1) + lens(j - 1))
        if (j >= 2) assert(l >= k + 1)
      }
    }
  }

  test("smooth signal compresses below 16 bits/sample; extremes survive") {
    val smooth = Array.tabulate(1000)(i => (100 * math.sin(i / 20.0)).toInt.toShort)
    val enc = Multimodal.encodeRice(smooth, 4)
    assert(enc.length < 1000 * 2 / 2, s"no compression: ${enc.length} bytes")
    val extremes = Array[Short](-32768, 32767, -32768, 32767, 0, -1, 1)
    val (_, got, _, _) = Multimodal.decodeRice(Multimodal.encodeRice(extremes, 4))
    assert(got.sameElements(extremes))
  }

  test("malformed streams throw (bad magic, truncation, runaway unary)") {
    val pcm = Array.tabulate(50)(i => (i * 7 - 100).toShort)
    val ok = Multimodal.encodeRice(pcm, 4)
    val badMagic = ok.clone(); badMagic(3) = '9'
    assertThrows[IllegalArgumentException](Multimodal.decodeRice(badMagic))
    // truncated bitstream: declared count needs more bits than present
    assertThrows[IllegalArgumentException](
      Multimodal.decodeRice(ok.take(ok.length - 3)))
    // runaway unary: all-zero bitstream never terminates a quotient -> the
    // bounds check must throw, not loop
    val zeros = ok.clone()
    (12 until zeros.length).foreach(zeros(_) = 0)
    assertThrows[IllegalArgumentException](Multimodal.decodeRice(zeros))
  }
}
