package graft.ops

/** Real QOI ("Quite OK Image") codec — the public-domain (CC0) lossless
  * image format of qoiformat.org: byte-aligned ops over a running
  * 64-entry color table, signed-wraparound small diffs, and run-length
  * packing. The whole codec is plain byte arithmetic (no entropy coder,
  * no external library), which is exactly why it suits an executor hot
  * path: one linear pass, primitive arrays, no per-pixel allocation.
  *
  * Scope: 8-bit RGB (channels = 3) and RGBA (channels = 4), both
  * colorspace tags. The encoder is the canonical greedy op choice of the
  * reference implementation (RUN, then INDEX, then DIFF, then LUMA, then
  * RGB/RGBA), so encoded bytes are deterministic and comparable across
  * engines. The decoder is strict: malformed magic/dims/stream bounds/
  * end marker all throw IllegalArgumentException rather than producing
  * plausible garbage.
  *
  * Mirrors the reference's use of off-the-shelf image decode in its
  * multimodal tooling (same role as [[Png]]), re-expressed as JVM byte
  * arithmetic.
  */
object Qoi {

  private val OpRgb = 0xfe
  private val OpRgba = 0xff
  private val OpIndex = 0x00
  private val OpDiff = 0x40
  private val OpLuma = 0x80
  private val OpRun = 0xc0

  @inline private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  /** Wrap an int difference into the signed-byte window −128..127 (the
    * reference's `signed char` subtraction). */
  @inline private def sbyte(d: Int): Int = (d << 24) >> 24

  /** Encode top-down interleaved 8-bit samples (3/pixel RGB, 4/pixel
    * RGBA) into a QOI byte stream. */
  def encode(w: Int, h: Int, channels: Int, px: Array[Byte],
             colorspace: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, "empty image")
    require(channels == 3 || channels == 4, s"channels $channels")
    require(colorspace == 0 || colorspace == 1, s"colorspace $colorspace")
    require(px.length == w * h * channels, "sample count mismatch")
    val out = new java.io.ByteArrayOutputStream(14 + w * h + 8)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    for (v <- Seq(w, h); s <- Seq(24, 16, 8, 0)) out.write((v >>> s) & 0xff)
    out.write(channels); out.write(colorspace)
    val table = new Array[Int](64) // packed r<<24|g<<16|b<<8|a; zeroed = (0,0,0,0)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var run = 0
    val n = w * h
    var i = 0
    while (i < n) {
      val r = px(i * channels) & 0xff
      val g = px(i * channels + 1) & 0xff
      val b = px(i * channels + 2) & 0xff
      val a = if (channels == 4) px(i * channels + 3) & 0xff else pa
      if (r == pr && g == pg && b == pb && a == pa) {
        run += 1
        if (run == 62 || i == n - 1) { out.write(OpRun | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(OpRun | (run - 1)); run = 0 }
        val idx = hash(r, g, b, a)
        val packed = (r << 24) | (g << 16) | (b << 8) | a
        if (table(idx) == packed) out.write(OpIndex | idx)
        else {
          table(idx) = packed
          if (a == pa) {
            val vr = sbyte(r - pr); val vg = sbyte(g - pg); val vb = sbyte(b - pb)
            val vgr = sbyte(vr - vg); val vgb = sbyte(vb - vg)
            if (vr > -3 && vr < 2 && vg > -3 && vg < 2 && vb > -3 && vb < 2)
              out.write(OpDiff | ((vr + 2) << 4) | ((vg + 2) << 2) | (vb + 2))
            else if (vgr > -9 && vgr < 8 && vg > -33 && vg < 32 && vgb > -9 && vgb < 8) {
              out.write(OpLuma | (vg + 32))
              out.write(((vgr + 8) << 4) | (vgb + 8))
            } else {
              out.write(OpRgb); out.write(r); out.write(g); out.write(b)
            }
          } else {
            out.write(OpRgba); out.write(r); out.write(g); out.write(b); out.write(a)
          }
        }
        pr = r; pg = g; pb = b; pa = a
      }
      i += 1
    }
    for (_ <- 0 until 7) out.write(0)
    out.write(1)
    out.toByteArray
  }

  /** Decode a QOI stream: (width, height, channels, top-down interleaved
    * 8-bit samples). Strict: bad magic, zero/overflow dims, stream
    * under/overrun, or a missing end marker throw. */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length >= 14 + 8, "truncated QOI")
    require(bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' &&
      bytes(3) == 'f', "not a QOI stream")
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    val w = u32(4); val h = u32(8)
    val channels = bytes(12) & 0xff
    val colorspace = bytes(13) & 0xff
    require(w > 0 && h > 0 && w * h <= Int.MaxValue / 8, s"bad dims ${w}x$h")
    require(channels == 3 || channels == 4, s"channels $channels")
    require(colorspace == 0 || colorspace == 1, s"colorspace $colorspace")
    val n = (w * h).toInt
    val outPx = new Array[Byte](n * channels)
    val table = new Array[Int](64)
    var r = 0; var g = 0; var b = 0; var a = 255
    var p = 14
    val dataEnd = bytes.length - 8
    var i = 0
    while (i < n) {
      require(p < dataEnd, "QOI stream underrun")
      val b1 = bytes(p) & 0xff; p += 1
      var run = 1
      if (b1 == OpRgb) {
        require(p + 3 <= dataEnd, "RGB op truncated")
        r = bytes(p) & 0xff; g = bytes(p + 1) & 0xff; b = bytes(p + 2) & 0xff
        p += 3
      } else if (b1 == OpRgba) {
        require(p + 4 <= dataEnd, "RGBA op truncated")
        r = bytes(p) & 0xff; g = bytes(p + 1) & 0xff
        b = bytes(p + 2) & 0xff; a = bytes(p + 3) & 0xff
        p += 4
      } else (b1 & 0xc0) match {
        case OpIndex =>
          val v = table(b1 & 0x3f)
          r = (v >>> 24) & 0xff; g = (v >>> 16) & 0xff
          b = (v >>> 8) & 0xff; a = v & 0xff
        case OpDiff =>
          r = (r + ((b1 >> 4) & 3) - 2) & 0xff
          g = (g + ((b1 >> 2) & 3) - 2) & 0xff
          b = (b + (b1 & 3) - 2) & 0xff
        case OpLuma =>
          require(p < dataEnd, "LUMA op truncated")
          val b2 = bytes(p) & 0xff; p += 1
          val dg = (b1 & 0x3f) - 32
          r = (r + dg + ((b2 >> 4) & 15) - 8) & 0xff
          g = (g + dg) & 0xff
          b = (b + dg + (b2 & 15) - 8) & 0xff
        case _ => // OpRun
          run = (b1 & 0x3f) + 1
          require(run <= 62, "illegal run tag") // 63/64 collide with RGB/RGBA
      }
      table(hash(r, g, b, a)) = (r << 24) | (g << 16) | (b << 8) | a
      require(i + run <= n, "run past image end")
      var k = 0
      while (k < run) {
        val o = (i + k) * channels
        outPx(o) = r.toByte; outPx(o + 1) = g.toByte; outPx(o + 2) = b.toByte
        if (channels == 4) outPx(o + 3) = a.toByte
        k += 1
      }
      i += run
    }
    require(p == dataEnd, "trailing bytes before end marker")
    var z = 0
    while (z < 7) { require(bytes(dataEnd + z) == 0, "bad end marker"); z += 1 }
    require(bytes(dataEnd + 7) == 1, "bad end marker")
    (w.toInt, h.toInt, channels, outPx)
  }
}
