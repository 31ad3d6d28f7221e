package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * RDI Workhorse ADCP PD0 binary ensemble decoder (SURVEY §2.1's largest
 * reader, stglib/rdi/rdiadcpy.py:1-2157). Decodes the core data types:
 *   0x7F7F header (ndatatypes + offset table, stglib/rdi/rdiadcpy.py:960-976)
 *   0x0000 fixed leader (geometry: beams/cells/cell length/bin1 distance,
 *          :978-1160)
 *   0x0080 variable leader (ensemble number, RTC time, sensors, :1185-1270)
 *   0x0100 velocity (i16 mm/s per beam×cell, -32768 = bad, :1400-1420)
 *   0x0200 correlation / 0x0300 echo intensity / 0x0400 percent good
 *          (u8 per beam×cell, :1425-1495)
 *   0x0600 bottom track (per-beam range cm at +16, velocity mm/s at +24,
 *          -32768 = bad, :1844-1920)
 *   0x0F01 vertical beam leader (V-series; cell count at +2, :1622-1650) with
 *          0x0A00 velocity / 0x0B00 correlation / 0x0C00 amplitude / 0x0D00
 *          percent good per cell (:1668-1766) → vel5/cor5/echo5/pg5 columns
 *   0x3200 instrument transformation matrix (3 axes × nbeams raw i16,
 *          :1497-1527) → per-ensemble xform array (axis-major)
 *
 * Distribution model: files arrive via spark.read.format("binaryFile"); each
 * file's ensembles decode independently inside a flatMap — at 100 TB the
 * parallel unit is the file (instrument deployments are many files), and no
 * single decode holds more than one ensemble in memory.
 */
object Pd0 {

  final case class FixedLeader(nbeams: Int, ncells: Int, pingsPerEns: Int,
                               cellLengthCm: Int, blankCm: Int, bin1DistCm: Int)

  final case class VariableLeader(ensembleNumber: Long, year: Int, month: Int,
                                  day: Int, hour: Int, minute: Int, second: Int,
                                  hundredths: Int, speedOfSound: Int,
                                  xducerDepthDm: Int, headingCdeg: Int,
                                  pitchCdeg: Int, rollCdeg: Int, salinity: Int,
                                  temperatureCdegC: Int)

  /** One decoded bin of one ensemble — the long-format row. Percent-good is
    * per (cell, beam); bottom-track range/velocity are per-ensemble (beam
    * scalars, repeated on each bin row like the attitude sensors). */
  final case class Pd0Row(
      ensemble: Long, timeUs: Long, bin: Int, bindistM: Double,
      vel1: Option[Int], vel2: Option[Int], vel3: Option[Int], vel4: Option[Int],
      cor1: Int, cor2: Int, cor3: Int, cor4: Int,
      echo1: Int, echo2: Int, echo3: Int, echo4: Int,
      pg1: Int, pg2: Int, pg3: Int, pg4: Int,
      btRangeM1: Option[Double], btRangeM2: Option[Double],
      btRangeM3: Option[Double], btRangeM4: Option[Double],
      btVel1: Option[Int], btVel2: Option[Int],
      btVel3: Option[Int], btVel4: Option[Int],
      vel5: Option[Int], cor5: Option[Int], echo5: Option[Int], pg5: Option[Int],
      headingDeg: Double, pitchDeg: Double, rollDeg: Double,
      temperatureC: Double, xducerDepthM: Double,
      xform: Option[Array[Int]])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i16(b: Array[Byte], i: Int): Int = (u16(b, i) << 16) >> 16

  def parseFixedLeader(b: Array[Byte], off: Int): FixedLeader =
    FixedLeader(
      nbeams = u8(b, off + 8), ncells = u8(b, off + 9),
      pingsPerEns = i16(b, off + 10), cellLengthCm = i16(b, off + 12),
      blankCm = i16(b, off + 14), bin1DistCm = i16(b, off + 32))

  def parseVariableLeader(b: Array[Byte], off: Int): VariableLeader = {
    val yr0 = u8(b, off + 4)
    VariableLeader(
      ensembleNumber = u16(b, off + 2).toLong + (u8(b, off + 11).toLong << 16),
      year = if (yr0 < 50) yr0 + 2000 else yr0 + 1900,
      month = u8(b, off + 5), day = u8(b, off + 6), hour = u8(b, off + 7),
      minute = u8(b, off + 8), second = u8(b, off + 9), hundredths = u8(b, off + 10),
      speedOfSound = u16(b, off + 14), xducerDepthDm = u16(b, off + 16),
      headingCdeg = u16(b, off + 18), pitchCdeg = i16(b, off + 20),
      rollCdeg = i16(b, off + 22), salinity = u16(b, off + 24),
      temperatureCdegC = i16(b, off + 26))
  }

  /** Decode every ensemble in a PD0 byte stream to long-format rows. */
  def decode(bytes: Array[Byte]): Iterator[Pd0Row] = new Iterator[Pd0Row] {
    private var pos = 0
    private var queue: List[Pd0Row] = Nil

    private def advance(): Unit = {
      while (queue.isEmpty && pos + 6 <= bytes.length) {
        if (u8(bytes, pos) != 0x7f || u8(bytes, pos + 1) != 0x7f) { pos += 1 }
        else {
          val nbytes = u16(bytes, pos + 2)
          if (pos + nbytes + 2 > bytes.length) { pos = bytes.length }
          else {
            val ens = java.util.Arrays.copyOfRange(bytes, pos, pos + nbytes + 2)
            // checksum: u16 sum of all bytes before the checksum word
            var sum = 0
            var i = 0
            while (i < nbytes) { sum = (sum + (ens(i) & 0xff)) & 0xffff; i += 1 }
            if (sum == u16(ens, nbytes)) queue = decodeEnsemble(ens)
            pos += nbytes + 2
          }
        }
      }
    }

    override def hasNext: Boolean = { advance(); queue.nonEmpty }
    override def next(): Pd0Row = { advance(); val h = queue.head; queue = queue.tail; h }
  }

  private def decodeEnsemble(ens: Array[Byte]): List[Pd0Row] = {
    val ndt = u8(ens, 5)
    val offsets = (0 until ndt).map(i => u16(ens, 6 + i * 2))
    var fl: Option[FixedLeader] = None
    var vl: Option[VariableLeader] = None
    var vel: Option[Array[Array[Int]]] = None   // (cell)(beam)
    var cor: Option[Array[Array[Int]]] = None
    var echo: Option[Array[Array[Int]]] = None
    var pg: Option[Array[Array[Int]]] = None
    var btRange: Option[Array[Int]] = None      // (beam), cm
    var btVel: Option[Array[Int]] = None        // (beam), mm/s
    var vCells = 0                              // vertical beam leader
    var vVel: Option[Array[Int]] = None         // (vcell), mm/s
    var vCor: Option[Array[Int]] = None
    var vEcho: Option[Array[Int]] = None
    var vPg: Option[Array[Int]] = None
    var xform: Option[Array[Int]] = None        // 3 axes × nbeams, raw i16

    // first pass: leaders (geometry needed to size the data blocks)
    for (off <- offsets) u16(ens, off) match {
      case 0x0000 => fl = Some(parseFixedLeader(ens, off))
      case 0x0080 => vl = Some(parseVariableLeader(ens, off))
      case 0x0F01 => vCells = u16(ens, off + 2) // vertical beam leader
      case _      =>
    }
    for (off <- offsets; f <- fl) u16(ens, off) match {
      case 0x0100 =>
        vel = Some(Array.tabulate(f.ncells, f.nbeams)((c, b) =>
          i16(ens, off + 2 + 2 * (c * f.nbeams + b))))
      case 0x0200 =>
        cor = Some(Array.tabulate(f.ncells, f.nbeams)((c, b) =>
          u8(ens, off + 2 + c * f.nbeams + b)))
      case 0x0300 =>
        echo = Some(Array.tabulate(f.ncells, f.nbeams)((c, b) =>
          u8(ens, off + 2 + c * f.nbeams + b)))
      case 0x0400 =>
        pg = Some(Array.tabulate(f.ncells, f.nbeams)((c, b) =>
          u8(ens, off + 2 + c * f.nbeams + b)))
      case 0x0600 =>
        btRange = Some(Array.tabulate(f.nbeams)(b => i16(ens, off + 16 + 2 * b)))
        btVel = Some(Array.tabulate(f.nbeams)(b => i16(ens, off + 24 + 2 * b)))
      case 0x0A00 if vCells > 0 =>
        vVel = Some(Array.tabulate(vCells)(c => i16(ens, off + 2 + 2 * c)))
      case 0x0B00 if vCells > 0 =>
        vCor = Some(Array.tabulate(vCells)(c => u8(ens, off + 2 + c)))
      case 0x0C00 if vCells > 0 =>
        vEcho = Some(Array.tabulate(vCells)(c => u8(ens, off + 2 + c)))
      case 0x0D00 if vCells > 0 =>
        vPg = Some(Array.tabulate(vCells)(c => u8(ens, off + 2 + c)))
      case 0x3200 =>
        // Flat AXIS-MAJOR raw ints as laid out on the wire: index =
        // axis*nbeams + beam. NOTE this is the TRANSPOSE of the reference's
        // returned beam×3 array (rdiadcpy.py:1513-1527 transposes to
        // beam-major before returning); scaling to ±1 is a cdf2nc concern.
        xform = Some(Array.tabulate(3 * f.nbeams)(i =>
          i16(ens, off + 2 + 2 * i)))
      case _ =>
    }

    (fl, vl) match {
      case (Some(f), Some(v)) =>
        val timeUs = java.time.LocalDateTime
          .of(v.year, v.month, v.day, v.hour, v.minute, v.second, v.hundredths * 10000000)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
        def velAt(c: Int, b: Int): Option[Int] =
          if (c >= f.ncells) None else vel.map(_(c)(b)).filter(_ != -32768)
        def u8At(a: Option[Array[Array[Int]]], c: Int, b: Int): Int =
          if (c >= f.ncells) 0 else a.map(_(c)(b)).getOrElse(0)
        def btRangeAt(b: Int): Option[Double] =
          // signed decode matches the reference (rdiadcpy.py:1871 "<h");
          // range 0 = no bottom detection per the TRDI manual → None
          if (b >= f.nbeams) None
          else btRange.map(_(b)).filter(_ != 0).map(_ / 100.0)
        def btVelAt(b: Int): Option[Int] =
          if (b >= f.nbeams) None else btVel.map(_(b)).filter(_ != -32768)
        // the V-series vertical beam has its OWN cell count — emit rows out
        // to max(ncells, vCells); slant-beam fields are absent (None/0) and
        // bindist undefined (NaN) beyond the slant profile
        val nrows = math.max(f.ncells, vCells)
        (0 until nrows).map { c =>
          Pd0Row(
            ensemble = v.ensembleNumber, timeUs = timeUs, bin = c,
            bindistM = if (c < f.ncells)
              (f.bin1DistCm + c * f.cellLengthCm) / 100.0 else Double.NaN,
            vel1 = velAt(c, 0), vel2 = velAt(c, 1),
            vel3 = if (f.nbeams > 2) velAt(c, 2) else None,
            vel4 = if (f.nbeams > 3) velAt(c, 3) else None,
            cor1 = u8At(cor, c, 0), cor2 = u8At(cor, c, 1),
            cor3 = if (f.nbeams > 2) u8At(cor, c, 2) else 0,
            cor4 = if (f.nbeams > 3) u8At(cor, c, 3) else 0,
            echo1 = u8At(echo, c, 0), echo2 = u8At(echo, c, 1),
            echo3 = if (f.nbeams > 2) u8At(echo, c, 2) else 0,
            echo4 = if (f.nbeams > 3) u8At(echo, c, 3) else 0,
            pg1 = u8At(pg, c, 0), pg2 = u8At(pg, c, 1),
            pg3 = if (f.nbeams > 2) u8At(pg, c, 2) else 0,
            pg4 = if (f.nbeams > 3) u8At(pg, c, 3) else 0,
            btRangeM1 = btRangeAt(0), btRangeM2 = btRangeAt(1),
            btRangeM3 = btRangeAt(2), btRangeM4 = btRangeAt(3),
            btVel1 = btVelAt(0), btVel2 = btVelAt(1),
            btVel3 = btVelAt(2), btVel4 = btVelAt(3),
            vel5 = vVel.filter(_ => c < vCells).map(_(c)).filter(_ != -32768),
            cor5 = vCor.filter(_ => c < vCells).map(_(c)),
            echo5 = vEcho.filter(_ => c < vCells).map(_(c)),
            pg5 = vPg.filter(_ => c < vCells).map(_(c)),
            headingDeg = v.headingCdeg / 100.0, pitchDeg = v.pitchCdeg / 100.0,
            rollDeg = v.rollCdeg / 100.0, temperatureC = v.temperatureCdegC / 100.0,
            xducerDepthM = v.xducerDepthDm / 10.0,
            xform = xform)
        }.toList
      case _ => Nil
    }
  }

  /** Distributed read: binaryFile source → per-file decode. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(decode _)
      .toDF()
  }
}
