package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** G.711 mu-law codec invariants: decode→encode idempotence over the code
  * space, companding error bound, container round-trip, and strict
  * malformed-input behavior. */
class MulawSpec extends AnyFunSuite {

  test("decode -> encode returns the same code (all codes except negative zero)") {
    (0 to 255).foreach { code =>
      val amp = Multimodal.decodeMulawSample(code)
      val back = Multimodal.encodeMulawSample(amp)
      if (code == 127) assert(amp == 0 && back == 255) // -0 canonicalizes to +0
      else assert(back == code, s"code $code -> amp $amp -> $back")
    }
  }

  test("companding error is bounded by half the segment step") {
    val xs = (-32768 to 32767 by 97) ++ Seq(-32768, -32636, -32635, -1, 0, 1,
      31, 32, 32635, 32636, 32767)
    xs.foreach { x =>
      val code = Multimodal.encodeMulawSample(x)
      val amp = Multimodal.decodeMulawSample(code)
      val u = (~code) & 0xff
      val exp = (u >> 4) & 7
      val step = 1 << (exp + 3)
      val clipped = math.max(-32635, math.min(32635, x))
      assert(math.abs(amp - clipped) <= step / 2,
        s"x=$x amp=$amp exp=$exp step=$step")
    }
  }

  test("WAV tag-7 container round-trips; malformed input throws, never hangs") {
    val pcm = Array.tabulate(300)(i => ((i * 991) % 65536 - 32768).toShort)
    val wav = Multimodal.encodeWavMulaw(pcm, 8000)
    val (sr, codes, amps) = Multimodal.decodeWavMulaw(wav)
    assert(sr == 8000 && codes.length == 300)
    amps.zip(codes).foreach { case (a, c) =>
      assert(a == Multimodal.decodeMulawSample(c))
    }
    // PCM16 WAV (tag 1) must be rejected by the mu-law decoder
    val pcmWav = Multimodal.encodeWavPcm16(pcm, 8000)
    assertThrows[IllegalArgumentException](Multimodal.decodeWavMulaw(pcmWav))
    // truncated data chunk: size says more bytes than present
    val trunc = wav.take(wav.length - 10)
    assertThrows[IllegalArgumentException](Multimodal.decodeWavMulaw(trunc))
    // corrupt chunk size must throw (not loop): size -8 would stall pos
    val bad = wav.clone()
    bad(40) = 0xf8.toByte; bad(41) = 0xff.toByte
    bad(42) = 0xff.toByte; bad(43) = 0xff.toByte
    assertThrows[IllegalArgumentException](Multimodal.decodeWavMulaw(bad))
  }

  test("A-law: decode -> encode idempotent over all 256 codes; container strict") {
    (0 to 255).foreach { code =>
      val amp = Multimodal.decodeAlawSample(code)
      assert(Multimodal.encodeAlawSample(amp) == code, s"code $code amp $amp")
    }
    // quantization error bounded by half the segment step (PCM16 units)
    val xs = (-32768 to 32767 by 113) ++ Seq(-32768, -8, -1, 0, 1, 7, 8, 32767)
    xs.foreach { x =>
      val code = Multimodal.encodeAlawSample(x)
      val amp = Multimodal.decodeAlawSample(code)
      val seg = ((code ^ 0x55) & 0x70) >> 4
      val stepPcm = if (seg < 2) 16 else 16 << (seg - 1)
      assert(math.abs(amp - x) <= stepPcm / 2 + 8, s"x=$x amp=$amp seg=$seg")
    }
    // container: tag 6 round-trips; mu-law decoder rejects it and vice versa
    val pcm = Array.tabulate(100)(i => ((i * 653) % 65536 - 32768).toShort)
    val aw = Multimodal.encodeWavAlaw(pcm, 8000)
    val (sr, codes, amps) = Multimodal.decodeWavAlaw(aw)
    assert(sr == 8000 && codes.length == 100)
    amps.zip(codes).foreach { case (a, c) =>
      assert(a == Multimodal.decodeAlawSample(c))
    }
    assertThrows[IllegalArgumentException](Multimodal.decodeWavMulaw(aw))
    assertThrows[IllegalArgumentException](
      Multimodal.decodeWavAlaw(Multimodal.encodeWavMulaw(pcm, 8000)))
  }
}
