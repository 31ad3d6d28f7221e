package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** RIFF/WAVE PCM16 decoder — real byte-level parsing, not a stub. */
class WavSpec extends AnyFunSuite {

  test("encode → decode round-trips samples, rate, and channel count") {
    val samples = Array.tabulate(17)(i => (i * 1000 - 8000).toShort)
    val bytes = Multimodal.encodeWavPcm16(samples, 44100)
    val (sr, ch, got) = Multimodal.decodeWavPcm16(bytes)
    assert(sr == 44100 && ch == 1)
    assert(got.toSeq == samples.toSeq)
  }

  test("chunk walker skips foreign chunks (LIST with odd size + pad byte)") {
    val samples = Array[Short](1, -2, 32767, -32768)
    val base = Multimodal.encodeWavPcm16(samples, 8000)
    // splice an odd-sized LIST chunk between fmt and data (RIFF pads odd
    // chunk bodies to even length)
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes (odd)
    val pre = base.slice(0, 36)                 // through fmt chunk
    val post = base.slice(36, base.length)      // data chunk
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ listBody ++ Array[Byte](0) // pad to even
    val spliced = pre ++ list ++ post
    // fix the RIFF size field (bytes 4-7, little endian)
    val total = spliced.length - 8
    for (j <- 0 until 4) spliced(4 + j) = ((total >> (8 * j)) & 0xff).toByte
    val (sr, ch, got) = Multimodal.decodeWavPcm16(spliced)
    assert(sr == 8000 && ch == 1)
    assert(got.toSeq == samples.toSeq)
  }

  test("rejects non-WAV bytes and non-PCM formats") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16("definitely not audio".getBytes)
    }
    val bad = Multimodal.encodeWavPcm16(Array[Short](1, 2), 8000)
    bad(20) = 3 // audio format 3 = IEEE float
    intercept[IllegalArgumentException] { Multimodal.decodeWavPcm16(bad) }
  }

  test("BMP 24-bit round-trip: padding, bottom-up rows, BGR→RGB") {
    // width 3 → row bytes 9, stride 12 (padding load-bearing)
    val w = 3; val h = 2
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 5) % 256).toByte)
    val bytes = Multimodal.encodeBmp24(w, h, rgb)
    assert(bytes.length == 54 + 12 * h)
    val (gw, gh, got) = Multimodal.decodeBmp24(bytes)
    assert(gw == w && gh == h)
    assert(got.toSeq == rgb.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp24("not an image at all......".getBytes ++ new Array[Byte](54))
    }
  }

  test("malformed WAV chunk sizes throw instead of hanging or OOB-reading") {
    val base = Multimodal.encodeWavPcm16(Array[Short](1, 2, 3), 8000)
    // wrapped-negative chunk size (-8 would previously freeze pos)
    val neg = base.clone()
    for (j <- 0 until 4) neg(40 + j) = ((-8 >> (8 * j)) & 0xff).toByte
    intercept[IllegalArgumentException] { Multimodal.decodeWavPcm16(neg) }
    // truncated data chunk: declared size exceeds remaining bytes
    val trunc = base.slice(0, base.length - 2)
    intercept[IllegalArgumentException] { Multimodal.decodeWavPcm16(trunc) }
  }

  test("BMP top-down (negative biHeight) decodes; truncated pixel data throws") {
    val w = 3; val h = 2
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 5) % 256).toByte)
    val bytes = Multimodal.encodeBmp24(w, h, rgb)
    // flip to top-down: biHeight = -h, rows stored first-row-first
    val td = bytes.clone()
    for (j <- 0 until 4) td(22 + j) = ((-h >> (8 * j)) & 0xff).toByte
    val stride = 12
    for (y <- 0 until h) // swap the two stored rows back to top-down order
      System.arraycopy(bytes, 54 + (h - 1 - y) * stride, td, 54 + y * stride, stride)
    val (gw, gh, got) = Multimodal.decodeBmp24(td)
    assert(gw == w && gh == h && got.toSeq == rgb.toSeq)
    // truncated pixel data → bounds require, not OOB / giant allocation
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp24(bytes.slice(0, bytes.length - 4))
    }
  }

  test("tone pitch recovery through the codec: DFT argmax hits the synthesis bin") {
    // mirrors the multimodal_audio_pitch gate at unit level, without Spark
    for (k <- Seq(1, 7, 20)) {
      val n = 128
      val samples = Array.tabulate(n)(i =>
        math.round(12000.0 * math.sin(2 * math.Pi * k * i / n)).toShort)
      val (_, _, got) = Multimodal.decodeWavPcm16(
        Multimodal.encodeWavPcm16(samples, 8000))
      val powers = (1 to n / 2).map { bin =>
        val (re, im) = got.indices.foldLeft((0.0, 0.0)) { case ((r, m), i) =>
          val ph = 2 * math.Pi * bin * i / n
          (r + got(i) * math.cos(ph), m - got(i) * math.sin(ph))
        }
        bin -> (re * re + im * im)
      }
      assert(powers.maxBy(_._2)._1 == k, s"tone bin $k not recovered")
    }
  }

  test("interleaved stereo: channel-0 extraction") {
    // hand-build a 2-channel data chunk: pairs (L, R)
    val mono = Multimodal.encodeWavPcm16(Array[Short](0, 0, 0), 8000)
    val stereoData = Array[Short](10, -99, 20, -88, 30, -77)
    val out = new java.io.ByteArrayOutputStream()
    out.write(mono.slice(0, 22)) // header through fmt audioFormat
    out.write(Array[Byte](2, 0)) // channels = 2
    out.write(mono.slice(24, 36))
    out.write("data".getBytes("US-ASCII"))
    out.write(Array[Byte](12, 0, 0, 0))
    stereoData.foreach { v =>
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    val bytes = out.toByteArray
    val total = bytes.length - 8
    for (j <- 0 until 4) bytes(4 + j) = ((total >> (8 * j)) & 0xff).toByte
    val (_, ch, got) = Multimodal.decodeWavPcm16(bytes)
    assert(ch == 2)
    assert(got.toSeq == Seq[Short](10, 20, 30))
  }
}
