package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Imagenex 881A-GS sonar .81R decoder (stglib/son/raw2cdf.py:13-139 +
 * stglib/son/sonutils.py:5-207): fixed-size ping records, each
 * 1024-byte ping header + 1024-byte device list + switch command block +
 * return-data header (bit-packed head position) + echo intensity bytes.
 * This implements the 881A-GS variant (40-byte switch, 32-byte return
 * header) — the model exercised by the reference's test corpus.
 */
object Son81R {

  final case class PingHeader(
      model: Int, totalBytes: Int, switchBytes: Int, returnHeaderBytes: Int,
      orientationUp: Boolean, mode: Int, rangeOffset: Float,
      soundVelocity: Float, samplesPerPing: Long, rangeResolution: Float,
      pingNumber: Long, timeRaw: String)

  final case class SwitchCommand(
      range: Int, startGain: Int, trainAngleDeg: Double, sectorWidthDeg: Double,
      stepSizeDeg: Double, nDataPoints: Int, frequencyKhz: Int)

  final case class PingRow(
      ping: Long, timeRaw: String, headPosition: Int, headAngleDeg: Double,
      stepDirection: Int, profileRange: Int, sonarPosition: Int,
      sonarAngleDeg: Double, pitch: Double, roll: Double, heading: Double,
      gyroHeading: Double, intensities: Array[Byte])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def f32(b: Array[Byte], i: Int): Float =
    ByteBuffer.wrap(b, i, 4).order(ByteOrder.LITTLE_ENDIAN).getFloat
  private def u32(b: Array[Byte], i: Int): Long =
    ByteBuffer.wrap(b, i, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL

  /** parse_pingHeader (sonutils.py:25-78). */
  def parsePingHeader(h: Array[Byte]): PingHeader = {
    require(new String(h, 0, 3, "US-ASCII") == "81R", "not an 81R record")
    val model = u8(h, 3)
    PingHeader(
      model = model,
      totalBytes = u32(h, 4).toInt,
      switchBytes = if (model % 2 == 0) 128 else 40,
      returnHeaderBytes = if (model % 2 == 0) 256 else 32,
      orientationUp = (u8(h, 319) & 1) == 1,
      mode = u8(h, 324),
      rangeOffset = f32(h, 325),
      soundVelocity = f32(h, 338),
      samplesPerPing = u32(h, 353),
      rangeResolution = f32(h, 373),
      pingNumber = u32(h, 377),
      timeRaw = new String(h, 14, 13, "US-ASCII").replace("\u0000", ""))
  }

  /** parse_switchCommand (sonutils.py:85-114), 881A-GS 40-byte variant. */
  def parseSwitchCommand(s: Array[Byte]): SwitchCommand =
    SwitchCommand(
      range = u8(s, 3), startGain = u8(s, 8),
      trainAngleDeg = 3.0 * u8(s, 11) - 180.0,
      sectorWidthDeg = 3.0 * u8(s, 12),
      stepSizeDeg = 0.3 * u8(s, 13),
      nDataPoints = u8(s, 19) * 10,
      frequencyKhz = 175 + u8(s, 25) * 5)

  /** Decode every fixed-size ping record in an .81R byte stream. */
  def decode(bytes: Array[Byte]): Iterator[PingRow] = {
    if (bytes.length < 2048) return Iterator.empty
    val header0 = parsePingHeader(bytes.take(1024))
    val total = header0.totalBytes
    val npings = bytes.length / total
    val swOff = 1024 + 1024
    (0 until npings).iterator.map { i =>
      val rec = java.util.Arrays.copyOfRange(bytes, i * total, (i + 1) * total)
      val ph = parsePingHeader(rec.take(1024))
      val sw = parseSwitchCommand(
        java.util.Arrays.copyOfRange(rec, swOff, swOff + ph.switchBytes))
      val rh = java.util.Arrays.copyOfRange(rec,
        swOff + ph.switchBytes, swOff + ph.switchBytes + ph.returnHeaderBytes)
      // bit-packed head position (Doug Wilson's method, sonutils.py:125-131)
      val headPosition = (63 & u8(rh, 6)) * 128 + (127 & u8(rh, 5))
      val headAngle = (headPosition - 600) * sw.stepSizeDeg
      val stepDirection = (u8(rh, 6) & 64) >> 6
      // manual's 14-bit split-byte fields (sonutils.py:139-176): value =
      // HB<<8 | LB with HB = (hi & 0x7E) >> 1, LB = (hi & 1) << 7 | lo & 0x7F
      def pk(lo: Int, hi: Int): Int = {
        val hb = (u8(rh, hi) & 0x7e) >> 1
        (hb << 8) | ((u8(rh, hi) & 0x01) << 7) | (u8(rh, lo) & 0x7f)
      }
      val sonarPosition = pk(12, 13)
      // pitch carries a sign term keyed on the hi byte's LSB (sonutils:160)
      val pitch = (pk(14, 15) - 16384 * (u8(rh, 15) & 1)) * 360.0 / 16384
      // reference keeps all bytes from the data offset to totalBytes-1
      // (raw2cdf.py: image = imagedata[:, offset:-1]), independent of
      // the switch command's NDataPoints
      val dataOff = swOff + ph.switchBytes + ph.returnHeaderBytes
      PingRow(ph.pingNumber, ph.timeRaw, headPosition, headAngle,
        stepDirection, pk(8, 9), sonarPosition,
        0.3 * (sonarPosition - 600), pitch,
        pk(16, 17) * 360.0 / 16384, pk(18, 19) * 360.0 / 16384,
        pk(21, 22) * 360.0 / 16384,
        java.util.Arrays.copyOfRange(rec, dataOff, math.max(dataOff, total - 1)))
    }
  }
}
