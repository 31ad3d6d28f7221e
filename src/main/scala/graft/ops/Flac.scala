package graft.ops

/**
 * REAL FLAC codec, strict subset (xiph.org FLAC format specification /
 * RFC 9639 — public): 16-bit mono, fixed-blocksize frames, CONSTANT /
 * VERBATIM / FIXED-predictor subframes with one-partition Rice residuals
 * — the lossless-audio marquee format, and the full-container big sibling
 * of the repo's Shorten/Rice subframe codec (Multimodal.encodeRice).
 *
 * Everything here is from the published spec: the "fLaC" marker +
 * STREAMINFO metadata block; frame sync 0b11111111111110 with CRC-8
 * (poly 0x07) header protection and whole-frame CRC-16 (poly 0x8005);
 * UTF-8-coded frame numbers; subframe type codes (CONSTANT 000000,
 * VERBATIM 000001, FIXED 001xxx); residual method 00 (4-bit Rice
 * parameter), zigzag folding, unary = q zeros then a 1 (MSB-first
 * bitstream throughout). Encoder picks CONSTANT when the block is flat,
 * else FIXED order 2 with the EXACT cheapest Rice parameter k ∈ 0..14
 * (deterministic — no heuristics), escaping to VERBATIM if Rice would
 * exceed it. The decoder is strict-bounds: bad magic, bad sync, CRC
 * mismatch, unary runs past the end, or out-of-range reconstruction all
 * throw — never hang, never over-read.
 *
 * No FLAC tooling exists in this container, so the gates are the same
 * standard the QOI codec used: golden bytes derived from the spec's own
 * algorithms (CRC vectors in FlacSpec), lossless round trips, and
 * corruption detection.
 */
object Flac {

  // ---- CRCs from the spec polynomials ------------------------------
  private val crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var b = 0
      while (b < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; b += 1 }
      t(i) = c; i += 1
    }
    t
  }
  private val crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var b = 0
      while (b < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; b += 1 }
      t(i) = c; i += 1
    }
    t
  }
  private[ops] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Table((c ^ (bytes(i) & 0xff)) & 0xff); i += 1 }
    c
  }
  private[ops] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc16Table(((c >> 8) ^ (bytes(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c
  }

  // ---- MSB-first bit writer/reader ---------------------------------
  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def putBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def putUnary(q: Long): Unit = { var i = 0L; while (i < q) { putBits(0, 1); i += 1 }; putBits(1, 1) }
    def alignZero(): Unit = if (nb != 0) putBits(0, 8 - nb)
    def bytes: Array[Byte] = { require(nb == 0, "unaligned"); buf.toArray }
  }
  private final class BitReader(a: Array[Byte], var pos: Int) {
    private var bit = 0
    def getBit(): Int = {
      require(pos < a.length, "truncated FLAC bitstream")
      val v = (a(pos) >> (7 - bit)) & 1
      bit += 1; if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def getBits(n: Int): Long = { var v = 0L; var i = 0; while (i < n) { v = (v << 1) | getBit(); i += 1 }; v }
    def getUnary(limit: Long): Long = {
      var q = 0L
      while (getBit() == 0) { q += 1; require(q <= limit, "unary run past bound") }
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  private def sext(v: Long, bits: Int): Int =
    ((v << (64 - bits)) >> (64 - bits)).toInt

  /** Exact Rice cost in bits of zigzagged residuals under parameter k. */
  private def riceCost(z: Array[Long], k: Int): Long =
    z.foldLeft(0L)((acc, v) => acc + (v >> k) + 1 + k)

  // ---- encoder ------------------------------------------------------
  /** Encode 16-bit mono PCM to a FLAC stream (fixed block size). */
  def encode(samples: Array[Short], sampleRate: Int,
             blockSize: Int = 4096): Array[Byte] = {
    require(samples.nonEmpty && sampleRate > 0 && sampleRate < (1 << 20))
    require(blockSize >= 16 && blockSize <= 65535)
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO: last-block flag 1, type 0, length 34
    val si = new BitWriter
    si.putBits(1, 1); si.putBits(0, 7); si.putBits(34, 24)
    si.putBits(blockSize, 16); si.putBits(blockSize, 16) // min/max blocksize
    si.putBits(0, 24); si.putBits(0, 24) // min/max framesize: unknown
    si.putBits(sampleRate, 20)
    si.putBits(0, 3)  // channels - 1 (mono)
    si.putBits(15, 5) // bits per sample - 1
    si.putBits(samples.length.toLong, 36)
    (0 until 16).foreach(_ => si.putBits(0, 8)) // md5 unset
    out.write(si.bytes)
    var frameNo = 0L
    var off = 0
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      out.write(encodeFrame(samples, off, n, frameNo))
      off += n; frameNo += 1
    }
    out.toByteArray
  }

  private def utf8Code(w: BitWriter, v: Long): Unit = {
    // the spec's UTF-8-style coding of frame numbers
    if (v < 0x80) w.putBits(v, 8)
    else if (v < 0x800) { w.putBits(0xC0 | (v >> 6), 8); w.putBits(0x80 | (v & 0x3f), 8) }
    else { require(v < 0x10000); w.putBits(0xE0 | (v >> 12), 8)
      w.putBits(0x80 | ((v >> 6) & 0x3f), 8); w.putBits(0x80 | (v & 0x3f), 8) }
  }

  private def encodeFrame(s: Array[Short], off: Int, n: Int,
                          frameNo: Long): Array[Byte] = {
    val w = new BitWriter
    w.putBits(0x3FFE, 14) // sync
    w.putBits(0, 1)  // reserved
    w.putBits(0, 1)  // fixed-blocksize stream
    w.putBits(0x7, 4) // block size: 16-bit value - 1 at end of header
    w.putBits(0x0, 4) // sample rate: from STREAMINFO
    w.putBits(0x0, 4) // channel assignment: mono
    w.putBits(0x4, 3) // sample size: 16 bits
    w.putBits(0, 1)  // reserved
    utf8Code(w, frameNo)
    w.putBits((n - 1).toLong, 16)
    val headNoCrc = { w.alignZero(); w.bytes } // header is byte-aligned here
    val w2 = new BitWriter
    writeSubframe(w2, Array.tabulate(n)(j => s(off + j).toInt), 16)
    w2.alignZero()
    val body = w2.bytes
    val hdr = new Array[Byte](headNoCrc.length + 1)
    System.arraycopy(headNoCrc, 0, hdr, 0, headNoCrc.length)
    hdr(headNoCrc.length) = crc8(headNoCrc, 0, headNoCrc.length).toByte
    val frame = new Array[Byte](hdr.length + body.length + 2)
    System.arraycopy(hdr, 0, frame, 0, hdr.length)
    System.arraycopy(body, 0, frame, hdr.length, body.length)
    val c16 = crc16(frame, 0, hdr.length + body.length)
    frame(frame.length - 2) = ((c16 >> 8) & 0xff).toByte
    frame(frame.length - 1) = (c16 & 0xff).toByte
    frame
  }

  /** One subframe, bps-parametric (mono uses 16; a stereo SIDE channel
    * needs bps+1 = 17 — the decorrelated difference spans ±65535). */
  private def writeSubframe(w2: BitWriter, v: Array[Int], bps: Int): Unit = {
    val n = v.length
    val mask = (1L << bps) - 1
    val flat = v.forall(_ == v(0))
    if (flat) {
      w2.putBits(0, 1); w2.putBits(0x00, 6); w2.putBits(0, 1) // CONSTANT
      w2.putBits(v(0).toLong & mask, bps)
    } else if (n <= 2) {
      w2.putBits(0, 1); w2.putBits(0x01, 6); w2.putBits(0, 1) // VERBATIM
      v.foreach(x => w2.putBits(x.toLong & mask, bps))
    } else {
      // FIXED order 2: e_i = v_i − 2v_{i−1} + v_{i−2}
      val z = Array.tabulate(n - 2) { j =>
        val e = v(j + 2) - 2 * v(j + 1) + v(j)
        if (e >= 0) 2L * e else -2L * e - 1
      }
      val bestK = (0 to 14).minBy(k => riceCost(z, k))
      if (riceCost(z, bestK) > bps.toLong * (n - 2)) {
        w2.putBits(0, 1); w2.putBits(0x01, 6); w2.putBits(0, 1) // VERBATIM
        v.foreach(x => w2.putBits(x.toLong & mask, bps))
      } else {
        w2.putBits(0, 1); w2.putBits(0x08 | 0x02, 6); w2.putBits(0, 1) // FIXED o=2
        w2.putBits(v(0).toLong & mask, bps) // warmup
        w2.putBits(v(1).toLong & mask, bps)
        w2.putBits(0x0, 2)  // residual method: 4-bit rice
        w2.putBits(0x0, 4)  // partition order 0
        w2.putBits(bestK.toLong, 4)
        z.foreach { x => w2.putUnary(x >> bestK); w2.putBits(x & ((1L << bestK) - 1), bestK) }
      }
    }
  }

  /** Read one subframe of `n` samples at `bps` bits into `out`. */
  private def readSubframe(rb: BitReader, n: Int, bps: Int): Array[Int] = {
    val out = new Array[Int](n)
    require(rb.getBits(1) == 0, "subframe padding bit set")
    val sfType = rb.getBits(6).toInt
    require(rb.getBits(1) == 0, "wasted bits unsupported")
    val lim = 1 << (bps - 1)
    sfType match {
      case 0x00 =>
        val v = sext(rb.getBits(bps), bps)
        java.util.Arrays.fill(out, v)
      case 0x01 =>
        (0 until n).foreach(i => out(i) = sext(rb.getBits(bps), bps))
      case t if (t & 0x38) == 0x08 =>
        val order = t & 0x07
        require(order <= 4, "bad fixed order")
        (0 until order).foreach(i => out(i) = sext(rb.getBits(bps), bps))
        require(rb.getBits(2) == 0, "only 4-bit rice residuals supported")
        require(rb.getBits(4) == 0, "only partition order 0 supported")
        val k = rb.getBits(4).toInt
        require(k < 15, "rice escape code unsupported")
        var i = order
        while (i < n) {
          val q = rb.getUnary(1L << 22)
          val z = (q << k) | rb.getBits(k)
          val e = if ((z & 1) == 0) (z >> 1) else -((z + 1) >> 1)
          val p: Long = order match {
            case 0 => 0L
            case 1 => out(i - 1).toLong
            case 2 => 2L * out(i - 1) - out(i - 2)
            case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
            case _ => 4L * out(i - 1) - 6L * out(i - 2) +
              4L * out(i - 3) - out(i - 4)
          }
          val v = p + e
          require(v >= -lim && v < lim, "reconstruction outside sample range")
          out(i) = v.toInt
          i += 1
        }
      case _ => throw new IllegalArgumentException("unsupported subframe type")
    }
    out
  }

  /** Stereo encode with LEFT/SIDE decorrelation (channel assignment
    * 0b1000): subframe 0 = left at 16 bits, subframe 1 = side =
    * left − right at 17 bits — FLAC's signature inter-channel trick
    * (correlated channels make the side nearly silent, so its residuals
    * Rice-code tightly). */
  def encodeStereo(left: Array[Short], right: Array[Short], sampleRate: Int,
                   blockSize: Int = 4096): Array[Byte] = {
    require(left.length == right.length && left.nonEmpty)
    require(sampleRate > 0 && sampleRate < (1 << 20))
    require(blockSize >= 16 && blockSize <= 65535)
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = new BitWriter
    si.putBits(1, 1); si.putBits(0, 7); si.putBits(34, 24)
    si.putBits(blockSize, 16); si.putBits(blockSize, 16)
    si.putBits(0, 24); si.putBits(0, 24)
    si.putBits(sampleRate, 20)
    si.putBits(1, 3)  // channels - 1 = 1
    si.putBits(15, 5)
    si.putBits(left.length.toLong, 36)
    (0 until 16).foreach(_ => si.putBits(0, 8))
    out.write(si.bytes)
    var frameNo = 0L
    var off = 0
    while (off < left.length) {
      val n = math.min(blockSize, left.length - off)
      val w = new BitWriter
      w.putBits(0x3FFE, 14); w.putBits(0, 1); w.putBits(0, 1)
      w.putBits(0x7, 4); w.putBits(0x0, 4)
      w.putBits(0x8, 4) // channel assignment: left/side
      w.putBits(0x4, 3); w.putBits(0, 1)
      utf8Code(w, frameNo)
      w.putBits((n - 1).toLong, 16)
      val headNoCrc = { w.alignZero(); w.bytes }
      val w2 = new BitWriter
      writeSubframe(w2, Array.tabulate(n)(j => left(off + j).toInt), 16)
      writeSubframe(w2, Array.tabulate(n)(j =>
        left(off + j).toInt - right(off + j).toInt), 17)
      w2.alignZero()
      val body = w2.bytes
      val hdr = new Array[Byte](headNoCrc.length + 1)
      System.arraycopy(headNoCrc, 0, hdr, 0, headNoCrc.length)
      hdr(headNoCrc.length) = crc8(headNoCrc, 0, headNoCrc.length).toByte
      val frame = new Array[Byte](hdr.length + body.length + 2)
      System.arraycopy(hdr, 0, frame, 0, hdr.length)
      System.arraycopy(body, 0, frame, hdr.length, body.length)
      val c16 = crc16(frame, 0, hdr.length + body.length)
      frame(frame.length - 2) = ((c16 >> 8) & 0xff).toByte
      frame(frame.length - 1) = (c16 & 0xff).toByte
      out.write(frame)
      off += n; frameNo += 1
    }
    out.toByteArray
  }

  /** Strict stereo decode → (sampleRate, left, right). */
  def decodeStereo(bytes: Array[Byte]): (Int, Array[Short], Array[Short]) = {
    require(bytes.length > 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C', "bad FLAC magic")
    var pos = 4
    var sampleRate = 0
    var total = 0L
    var last = false
    while (!last) {
      require(pos + 4 <= bytes.length, "truncated metadata header")
      val b0 = bytes(pos) & 0xff
      last = (b0 & 0x80) != 0
      val btype = b0 & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      pos += 4
      require(pos + len <= bytes.length, "truncated metadata block")
      if (btype == 0) {
        require(len == 34, "bad STREAMINFO length")
        val r = new BitReader(bytes, pos)
        r.getBits(16); r.getBits(16); r.getBits(24); r.getBits(24)
        sampleRate = r.getBits(20).toInt
        require(r.getBits(3) == 1, "expected stereo")
        require(r.getBits(5) == 15, "only 16-bit supported")
        total = r.getBits(36)
      }
      pos += len
    }
    require(sampleRate > 0 && total <= Int.MaxValue, "bad STREAMINFO")
    val l = new Array[Short](total.toInt)
    val rr = new Array[Short](total.toInt)
    var got = 0
    while (got < total) {
      val r = new BitReader(bytes, pos)
      require(r.getBits(14) == 0x3FFE, "lost frame sync")
      require(r.getBits(1) == 0 && { r.getBits(1); true })
      val bsCode = r.getBits(4).toInt
      require(r.getBits(4) == 0, "only sample-rate-from-STREAMINFO supported")
      require(r.getBits(4) == 0x8, "expected left/side channel assignment")
      require(r.getBits(3) == 4 && r.getBits(1) == 0)
      utf8Decode(r)
      val n = bsCode match {
        case 0x7 => r.getBits(16).toInt + 1
        case 0x6 => r.getBits(8).toInt + 1
        case _ => throw new IllegalArgumentException("unsupported blocksize code")
      }
      r.align()
      val hdrEnd = r.pos
      require(hdrEnd < bytes.length, "truncated header")
      require((crc8(bytes, pos, hdrEnd) & 0xff) == (bytes(hdrEnd) & 0xff),
        "frame header CRC-8 mismatch")
      val rb = new BitReader(bytes, hdrEnd + 1)
      val left = readSubframe(rb, n, 16)
      val side = readSubframe(rb, n, 17)
      rb.align()
      val bodyEnd = rb.pos
      require(bodyEnd + 2 <= bytes.length, "truncated frame footer")
      val want = ((bytes(bodyEnd) & 0xff) << 8) | (bytes(bodyEnd + 1) & 0xff)
      require(crc16(bytes, pos, bodyEnd) == want, "frame CRC-16 mismatch")
      var i = 0
      while (i < n) {
        val ri = left(i) - side(i)
        require(ri >= Short.MinValue && ri <= Short.MaxValue,
          "right channel outside PCM16")
        l(got + i) = left(i).toShort
        rr(got + i) = ri.toShort
        i += 1
      }
      got += n; pos = bodyEnd + 2
    }
    (sampleRate, l, rr)
  }

  final case class FlacDoc(media_id: Long, n_samples: Int, sample_rate: Int,
                           n_bytes: Int, rice_k: Int, rice_cost: Long)

  /** Registered-query harness: synthesize n PCM16 samples per id from a
    * closed-form rule, run the REAL FLAC encode → strict decode round
    * trip (losslessness + sample-rate recovery enforced with require),
    * and emit the container byte size plus the chosen Rice parameter and
    * exact residual bit cost. The oracle replays the order-2 predictor,
    * zigzag, the k ∈ 0..14 cost minimization, AND the whole-container
    * byte layout (42 stream bytes + 8 header + padded body + CRC-16) —
    * a wrong unary run, warmup width, or header field shifts n_bytes and
    * fails the hash. The harness also requires the Rice path beat
    * VERBATIM, so a synthesis change that would flip the encoder's
    * choice fails loud instead of silently changing semantics. */
  def flacRoundTrip(df: org.apache.spark.sql.DataFrame, idCol: String,
                    n: Int, sampleRate: Int):
      org.apache.spark.sql.Dataset[FlacDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val pcm = Array.tabulate(n)(i =>
            (((id * 37 + i.toLong * i * 5 + i) % 1024) - 512).toShort)
          val enc = encode(pcm, sampleRate, blockSize = math.max(16, n))
          val (sr, got) = decode(enc)
          require(sr == sampleRate && got.sameElements(pcm),
            "FLAC round trip diverged")
          val z = Array.tabulate(n - 2) { j =>
            val e = pcm(j + 2) - 2 * pcm(j + 1) + pcm(j)
            if (e >= 0) 2L * e else -2L * e - 1
          }
          val k = (0 to 14).minBy(kk => riceCost(z, kk))
          val cost = riceCost(z, k)
          require(cost <= 16L * (n - 2), "expected the Rice path to win")
          FlacDoc(id, n, sr, enc.length, k, cost)
        }
      }
  }

  // ---- decoder ------------------------------------------------------
  /** Strict decode → (sampleRate, samples). */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length > 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C', "bad FLAC magic")
    var pos = 4
    var sampleRate = 0
    var total = 0L
    var last = false
    var seenStreamInfo = false
    while (!last) {
      require(pos + 4 <= bytes.length, "truncated metadata header")
      val b0 = bytes(pos) & 0xff
      last = (b0 & 0x80) != 0
      val btype = b0 & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      pos += 4
      require(pos + len <= bytes.length, "truncated metadata block")
      if (btype == 0) {
        require(len == 34, "bad STREAMINFO length")
        val r = new BitReader(bytes, pos)
        r.getBits(16); r.getBits(16); r.getBits(24); r.getBits(24)
        sampleRate = r.getBits(20).toInt
        require(r.getBits(3) == 0, "only mono supported")
        require(r.getBits(5) == 15, "only 16-bit supported")
        total = r.getBits(36)
        seenStreamInfo = true
      }
      pos += len
    }
    require(seenStreamInfo && sampleRate > 0, "missing STREAMINFO")
    require(total <= Int.MaxValue, "stream too long")
    val outArr = new Array[Short](total.toInt)
    var got = 0
    while (got < total) {
      val (n, next) = decodeFrame(bytes, pos, outArr, got)
      got += n; pos = next
    }
    (sampleRate, outArr)
  }

  private def utf8Decode(r: BitReader): Long = {
    val b0 = r.getBits(8)
    if ((b0 & 0x80) == 0) b0
    else if ((b0 & 0xE0) == 0xC0) {
      val b1 = r.getBits(8); require((b1 & 0xC0) == 0x80, "bad utf8 frame no")
      ((b0 & 0x1F) << 6) | (b1 & 0x3F)
    } else {
      require((b0 & 0xF0) == 0xE0, "bad utf8 frame no")
      val b1 = r.getBits(8); val b2 = r.getBits(8)
      require((b1 & 0xC0) == 0x80 && (b2 & 0xC0) == 0x80, "bad utf8 frame no")
      ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    }
  }

  private def decodeFrame(a: Array[Byte], start: Int, out: Array[Short],
                          outOff: Int): (Int, Int) = {
    val r = new BitReader(a, start)
    require(r.getBits(14) == 0x3FFE, "lost frame sync")
    require(r.getBits(1) == 0, "reserved bit set")
    r.getBits(1) // blocking strategy
    val bsCode = r.getBits(4).toInt
    val srCode = r.getBits(4).toInt
    require(r.getBits(4) == 0, "only mono supported")
    require(r.getBits(3) == 4, "only 16-bit supported")
    require(r.getBits(1) == 0, "reserved bit set")
    utf8Decode(r)
    val n = bsCode match {
      case 0x6 => r.getBits(8).toInt + 1
      case 0x7 => r.getBits(16).toInt + 1
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case c if c >= 8 => 256 << (c - 8)
      case _ => throw new IllegalArgumentException("unsupported blocksize code")
    }
    require(srCode == 0, "only sample-rate-from-STREAMINFO supported")
    r.align()
    val hdrEnd = r.pos
    require(hdrEnd < a.length, "truncated header")
    require((crc8(a, start, hdrEnd) & 0xff) == (a(hdrEnd) & 0xff),
      "frame header CRC-8 mismatch")
    val rb = new BitReader(a, hdrEnd + 1)
    require(outOff + n <= out.length, "frame overruns declared total")
    val mono = readSubframe(rb, n, 16)
    (0 until n).foreach(i => out(outOff + i) = mono(i).toShort)
    rb.align()
    val bodyEnd = rb.pos
    require(bodyEnd + 2 <= a.length, "truncated frame footer")
    val want = ((a(bodyEnd) & 0xff) << 8) | (a(bodyEnd + 1) & 0xff)
    require(crc16(a, start, bodyEnd) == want, "frame CRC-16 mismatch")
    (n, bodyEnd + 2)
  }
}
