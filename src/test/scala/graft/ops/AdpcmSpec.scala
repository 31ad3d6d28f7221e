package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** IMA ADPCM codec invariants: encoder fidelity on smooth signals, the
  * index carry across blocks, and strict-bounds rejection of malformed
  * containers. */
class AdpcmSpec extends AnyFunSuite {

  private def sine(n: Int, amp: Double, period: Double): Array[Short] =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * i / period)).toShort)

  test("encode → decode tracks a smooth signal within ADPCM error bounds") {
    val blockAlign = 256 // 505 samples per block
    val spb = Multimodal.imaSamplesPerBlock(blockAlign)
    val samples = sine(spb * 4, amp = 12000, period = 64)
    val wav = Multimodal.encodeAdpcmIma(samples, 8000, blockAlign)
    val (sr, gotSpb, decoded) = Multimodal.decodeAdpcmIma(wav)
    assert(sr == 8000 && gotSpb == spb && decoded.length == samples.length)
    // 4-bit ADPCM on a slow sine: RMS error a few percent of amplitude
    // (measured ~2.2% here; a stub or broken step tracking lands far off)
    val rms = math.sqrt(samples.zip(decoded)
      .map { case (a, b) => val d = (a - b).toDouble; d * d }.sum / samples.length)
    assert(rms < 400.0, s"rms $rms")
    // block-header samples are exact by construction
    (0 until 4).foreach(b => assert(decoded(b * spb) == samples(b * spb)))
  }

  test("step index carries across blocks (header restates the running state)") {
    val blockAlign = 12
    val spb = Multimodal.imaSamplesPerBlock(blockAlign)
    // loud alternating signal drives the index high in block 0; block 1's
    // header byte 2 must restate the carried index, not reset to 0
    val samples = Array.tabulate(spb * 2)(i =>
      (if (i % 2 == 0) 20000 else -20000).toShort)
    val wav = Multimodal.encodeAdpcmIma(samples, 8000, blockAlign)
    val dataOff = 60 // fixed header layout of packAdpcmIma
    val idxBlock1 = wav(dataOff + blockAlign + 2) & 0xff
    assert(idxBlock1 > 0, "index reset instead of carried")
    val (_, _, decoded) = Multimodal.decodeAdpcmIma(wav)
    assert(decoded.length == samples.length)
  }

  test("decoder equals an independent from-definition reference on random nibbles") {
    val rnd = new scala.util.Random(42)
    val steps = Multimodal.imaStepsSql.stripPrefix("[").stripSuffix("]")
      .split(", ").map(_.toInt)
    for (_ <- 0 until 20) {
      val blockAlign = 8 + 2 * rnd.nextInt(8)
      val pred0 = rnd.nextInt(65536) - 32768
      val idx0 = rnd.nextInt(89)
      val nibs = Array.fill((blockAlign - 4) * 2)(rnd.nextInt(16))
      val blk = new Array[Byte](blockAlign)
      blk(0) = (pred0 & 0xff).toByte; blk(1) = ((pred0 >> 8) & 0xff).toByte
      blk(2) = idx0.toByte
      nibs.grouped(2).zipWithIndex.foreach { case (Array(lo, hi), k) =>
        blk(4 + k) = (lo | (hi << 4)).toByte
      }
      val (_, _, got) =
        Multimodal.decodeAdpcmIma(Multimodal.packAdpcmIma(Array(blk), blockAlign, 8000))
      // from-definition replay
      var pred = pred0; var idx = idx0
      val want = pred +: nibs.map { n =>
        val st = steps(idx)
        var d = st >> 3
        if ((n & 1) != 0) d += st >> 2
        if ((n & 2) != 0) d += st >> 1
        if ((n & 4) != 0) d += st
        pred = math.max(-32768, math.min(32767, if ((n & 8) != 0) pred - d else pred + d))
        idx = math.max(0, math.min(88, idx + Array(-1, -1, -1, -1, 2, 4, 6, 8)(n & 7)))
        pred
      }
      assert(got.map(_.toInt).toSeq == want.toSeq)
    }
  }

  test("malformed IMA containers throw: bad tag, bad index, ragged data") {
    val ok = Multimodal.packAdpcmIma(Array(new Array[Byte](12)), 12, 8000)
    // format tag corrupted → PCM16 path must also reject it
    val badTag = ok.clone(); badTag(20) = 1
    intercept[IllegalArgumentException](Multimodal.decodeAdpcmIma(badTag))
    // step index out of range
    val badIdx = ok.clone(); badIdx(60 + 2) = 120.toByte
    intercept[IllegalArgumentException](Multimodal.decodeAdpcmIma(badIdx))
    // data size not a multiple of blockAlign
    val ragged = ok.clone()
    ragged(56) = 11 // data chunk size 11
    intercept[IllegalArgumentException](
      Multimodal.decodeAdpcmIma(java.util.Arrays.copyOf(ragged, ragged.length - 1)))
  }
}
