package graft.io

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * netCDF classic-family writer/reader — CDF-1 ("classic"), CDF-2
 * ("64-bit offset", NETCDF3_64BIT_OFFSET) and CDF-5 ("64-bit data",
 * PnetCDF/netcdf-c NETCDF3_64BIT_DATA), big-endian, per the public format
 * grammar
 * (https://docs.unidata.ucar.edu/netcdf-c/current/file_format_specifications.html):
 * in CDF-2 ONLY the `begin` OFFSET widens to INT64 (NON_NEG stays 32-bit)
 * — the variant older netcdf-c wrote for >2 GiB archives; in CDF-5 every
 * NON_NEG size field (numrecs, name lengths, list counts, dim lengths,
 * ndims, dimids, vsize) and every OFFSET widens to INT64, `ABSENT` is a
 * 4-byte zero tag + 8-byte zero count, and the int64 external types
 * exist — so variables and offsets past 2 GiB are representable, which
 * the reference's default netCDF4 output has and CDF-1 lacks
 * (stglib/rsk/cdf2nc.py:145-147; xarray opens all classic variants
 * transparently, stglib/core/utils.py:862-877). Pure JVM, no native libs.
 *
 * Writer shape: a long-format DataFrame becomes 1-D record variables over
 * the unlimited `time` dimension, with global + per-variable attributes —
 * the layout every stglib time-series output uses. Rows stream through
 * `toLocalIterator` (no full collect); one file = one deployment, matching
 * the reference's file granularity. At cluster scale, exports fan out as
 * one file per deployment/profile partition (Sink.writeParquet(partitionBy)
 * upstream decides the split).
 *
 * Types: DoubleType→NC_DOUBLE, FloatType→NC_FLOAT, IntegerType→NC_INT;
 * LongType→NC_INT64 in CDF-5 (native 64-bit int), NC_DOUBLE in CDF-1
 * (classic has no 64-bit int; the reference's CF time encoding is
 * double-based).
 *
 * `headerPad` reserves a gap between the header and the first data byte —
 * the classic library exposes the same knob as nc__enddef's v_align/h_minfree
 * — and is how the spec's >2³¹ `begin` offsets are exercised without
 * materializing gigabytes (the gap is a filesystem hole).
 */
object Netcdf3 {

  private val NC_DIMENSION = 0x0a
  private val NC_VARIABLE = 0x0b
  private val NC_ATTRIBUTE = 0x0c
  private val NC_BYTE = 1
  private val NC_CHAR = 2
  private val NC_SHORT = 3
  private val NC_INT = 4
  private val NC_FLOAT = 5
  private val NC_DOUBLE = 6
  // CDF-5 external types
  private val NC_UBYTE = 7
  private val NC_USHORT = 8
  private val NC_UINT = 9
  private val NC_INT64 = 10
  private val NC_UINT64 = 11

  private def pad4(n: Int): Int = (4 - n % 4) % 4

  /** NON_NEG per the grammar: INT in CDF-1/2, INT64 in CDF-5. */
  private def writeSize(o: DataOutputStream, v: Long, v5: Boolean): Unit =
    if (v5) o.writeLong(v) else o.writeInt(v.toInt)
  private def sizeLen(v5: Boolean): Int = if (v5) 8 else 4

  private def writeName(o: DataOutputStream, s: String, v5: Boolean): Unit = {
    val b = s.getBytes("UTF-8")
    writeSize(o, b.length.toLong, v5); o.write(b)
    (0 until pad4(b.length)).foreach(_ => o.writeByte(0))
  }

  private def writeTextAttr(o: DataOutputStream, name: String, v: String,
                            v5: Boolean): Unit = {
    writeName(o, name, v5)
    o.writeInt(NC_CHAR)
    val b = v.getBytes("UTF-8")
    writeSize(o, b.length.toLong, v5); o.write(b)
    (0 until pad4(b.length)).foreach(_ => o.writeByte(0))
  }

  private def ncType(dt: DataType, v5: Boolean): Int = dt match {
    case FloatType => NC_FLOAT
    case IntegerType => NC_INT
    case LongType if v5 => NC_INT64
    case _ => NC_DOUBLE
  }
  /** EXACT external size per type (the classic grammar's xtype table).
    * A wrong width here corrupts the record stride for EVERY column of a
    * file with non-float variables, so unknown type codes throw instead
    * of defaulting. */
  private def ncSize(t: Int): Int = t match {
    case NC_BYTE | NC_CHAR | NC_UBYTE => 1
    case NC_SHORT | NC_USHORT => 2
    case NC_INT | NC_FLOAT | NC_UINT => 4
    case NC_DOUBLE | NC_INT64 | NC_UINT64 => 8
    case other => throw new IllegalArgumentException(s"unknown nc_type $other")
  }

  /** Write `df`'s numeric columns as record variables along the unlimited
    * `time` dimension. `attrs` = global attributes; `varAttrs` = per-column
    * attributes (units/long_name/...). Column order is preserved.
    * `version` 1 = CDF-1 classic, 5 = CDF-5 (64-bit data). */
  def write(df: DataFrame, path: String, attrs: Seq[(String, String)] = Nil,
            varAttrs: Map[String, Seq[(String, String)]] = Map.empty,
            version: Int = 1, headerPad: Long = 0L): Long = {
    require(version == 1 || version == 2 || version == 5,
      s"CDF version $version unsupported (1, 2 or 5)")
    require(headerPad >= 0, "headerPad must be non-negative")
    val v5 = version == 5
    // CDF-2 ("64-bit offset", magic CDF\x02): ONLY the `begin` OFFSET
    // widens to INT64; every NON_NEG stays 32-bit (the grammar's one
    // difference from CDF-1)
    val off64 = version >= 2
    val fields = df.schema.fields.toSeq
    // fail BEFORE any bytes hit disk: a non-numeric column would otherwise
    // throw mid-stream and leave a corrupt half-written file
    val bad = fields.filterNot(f => f.dataType match {
      case DoubleType | FloatType | IntegerType | LongType | ShortType |
           ByteType => true
      case _ => false
    })
    require(bad.isEmpty,
      s"netCDF export supports numeric columns only; cast or drop: " +
        bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    val types = fields.map(f => ncType(f.dataType, v5))
    val recSize = types.map(ncSize).sum

    val header = new java.io.ByteArrayOutputStream()
    val h = new DataOutputStream(header)
    h.writeBytes("CDF"); h.writeByte(version)
    writeSize(h, 0L, v5) // numrecs patched after streaming
    // dim_list: one record dim "time" (size 0 = unlimited)
    h.writeInt(NC_DIMENSION); writeSize(h, 1L, v5)
    writeName(h, "time", v5); writeSize(h, 0L, v5)
    // global attributes (ABSENT = zero tag + zero count, count NON_NEG-wide)
    if (attrs.nonEmpty) {
      h.writeInt(NC_ATTRIBUTE); writeSize(h, attrs.length.toLong, v5)
      attrs.foreach { case (k, v) => writeTextAttr(h, k, v, v5) }
    } else { h.writeInt(0); writeSize(h, 0L, v5) }
    // var_list — begins need the final header size: compute it first
    val sz = sizeLen(v5)
    val varMetaSize = fields.map { f =>
      val nameB = f.name.getBytes("UTF-8").length
      val va = varAttrs.getOrElse(f.name, Nil)
      val vaSize = if (va.isEmpty) 4 + sz else 4 + sz + va.map { case (k, v) =>
        val kb = k.getBytes("UTF-8").length; val vb = v.getBytes("UTF-8").length
        (sz + kb + pad4(kb)) + 4 + sz + (vb + pad4(vb)) // name, type, nelems, chars
      }.sum
      (sz + nameB + pad4(nameB)) + // name
        sz + sz +                  // ndims + one dimid
        vaSize +                   // vatt_list
        4 +                        // nc_type
        sz +                       // vsize
        (if (off64) 8 else 4)      // begin (OFFSET)
    }.sum
    val headerSize = header.size() + 4 + sz + varMetaSize
    h.writeInt(NC_VARIABLE); writeSize(h, fields.length.toLong, v5)
    var begin = headerSize.toLong + headerPad
    fields.zipWithIndex.foreach { case (f, i) =>
      writeName(h, f.name, v5)
      writeSize(h, 1L, v5); writeSize(h, 0L, v5) // 1 dim: dimid 0 (time)
      val va = varAttrs.getOrElse(f.name, Nil)
      if (va.nonEmpty) {
        h.writeInt(NC_ATTRIBUTE); writeSize(h, va.length.toLong, v5)
        va.foreach { case (k, v) => writeTextAttr(h, k, v, v5) }
      } else { h.writeInt(0); writeSize(h, 0L, v5) }
      h.writeInt(types(i))
      writeSize(h, ncSize(types(i)).toLong, v5) // vsize (per-record contribution)
      if (off64) h.writeLong(begin)
      else {
        require(begin <= Int.MaxValue,
          s"variable '${f.name}' begin $begin exceeds CDF-1's 32-bit offsets — write with version = 2 or 5")
        h.writeInt(begin.toInt)
      }
      begin += ncSize(types(i))
    }
    require(header.size() == headerSize, s"header size ${header.size()} != computed $headerSize")

    val raf = new java.io.RandomAccessFile(path, "rw")
    raf.setLength(0L)
    raf.write(header.toByteArray)
    if (headerPad > 0) raf.seek(headerSize.toLong + headerPad) // hole, not bytes
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(raf.getFD), 1 << 20))
    // record data: variables interleaved per record
    var nrecs = 0L
    val it = df.toLocalIterator()
    while (it.hasNext) {
      writeRecord(out, it.next(), types)
      nrecs += 1
    }
    out.flush()
    // patch numrecs at offset 4
    raf.seek(4)
    if (v5) raf.writeLong(nrecs) else raf.writeInt(nrecs.toInt)
    raf.close()
    nrecs
  }

  /** One record, variables interleaved in header order (the record-data
    * layout both [[write]] and [[append]] stream). */
  private def writeRecord(out: DataOutputStream, row: org.apache.spark.sql.Row,
                          types: Seq[Int]): Unit =
    types.zipWithIndex.foreach { case (t, i) =>
      val isNull = row.isNullAt(i)
      t match {
        case NC_INT =>
          out.writeInt(if (isNull) Int.MinValue
            else row.get(i).asInstanceOf[Number].intValue())
        case NC_INT64 =>
          out.writeLong(if (isNull) Long.MinValue
            else row.get(i).asInstanceOf[Number].longValue())
        case NC_FLOAT =>
          out.writeFloat(if (isNull) Float.NaN
            else row.get(i).asInstanceOf[Number].floatValue())
        case _ =>
          out.writeDouble(if (isNull) Double.NaN
            else row.get(i).asInstanceOf[Number].doubleValue())
      }
    }

  /** Append records to an existing classic file IN PLACE — extend the
    * unlimited `time` dimension by streaming new records at the end of
    * the record section and patching `numrecs`, O(new records) I/O
    * regardless of archive size (the reference's xarray workflow
    * re-writes the whole file; a growing deployment archive wants the
    * spec's native append). Works on all three classic variants
    * (CDF-1/2/5). Only the header PREFIX is read (grown geometrically if
    * an attribute-heavy header overruns the first guess), never the
    * record data.
    *
    * `df`'s columns must match the file's record variables in order and
    * external type. Restricted to this writer's layout: every variable a
    * 1-D record variable of a 4/8-byte type (so per-record contributions
    * never need the classic spec's 4-byte padding). Returns the new
    * total record count. */
  def append(df: DataFrame, path: String): Long = {
    val f = new java.io.File(path)
    val fileLen = f.length()
    require(fileLen > 8, s"$path: not a classic netCDF file")
    var prefLen = math.min(fileLen, 1L << 16).toInt
    var hdr: NcHeader = null
    while (hdr == null) {
      val pref = new Array[Byte](prefLen)
      val in = new java.io.RandomAccessFile(f, "r")
      try in.readFully(pref) finally in.close()
      try hdr = parseHeader(pref)
      catch {
        case e @ (_: IndexOutOfBoundsException |
                  _: java.nio.BufferUnderflowException) =>
          if (prefLen >= fileLen) throw e
          prefLen = math.min(fileLen, prefLen.toLong * 4).toInt
      }
    }
    val recVars = hdr.vars.filter(hdr.isRecord)
    require(recVars.length == hdr.vars.length &&
        recVars.forall(v => v.dimids.length == 1 && ncSize(v.ncType) >= 4),
      "append supports files of 1-D record variables with 4/8-byte types" +
        " (this writer's layout)")
    val fields = df.schema.fields.toSeq
    require(fields.map(_.name) == recVars.map(_.name),
      s"columns must match the file's variables in order:" +
        s" ${recVars.map(_.name).mkString(",")}")
    val v5 = hdr.version == 5
    fields.zip(recVars).foreach { case (fl, v) =>
      require(ncType(fl.dataType, v5) == v.ncType,
        s"${fl.name}: ${fl.dataType.simpleString} does not stream as the" +
          s" file's nc_type ${v.ncType}")
    }
    val types = recVars.map(_.ncType)
    val start = recVars.map(_.begin).min
    val raf = new java.io.RandomAccessFile(f, "rw")
    raf.seek(start + hdr.numrecs * hdr.recSize)
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(raf.getFD), 1 << 20))
    var nrecs = hdr.numrecs
    val it = df.toLocalIterator()
    while (it.hasNext) {
      writeRecord(out, it.next(), types)
      nrecs += 1
    }
    out.flush()
    raf.seek(4)
    if (v5) raf.writeLong(nrecs)
    else {
      require(nrecs <= Int.MaxValue,
        s"$nrecs records exceed CDF-${hdr.version}'s 32-bit numrecs —" +
          " re-write with version = 5")
      raf.writeInt(nrecs.toInt)
    }
    raf.close()
    nrecs
  }

  // ---- minimal reader (raw-.cdf re-open + writer validation) ----------

  final case class NcVar(name: String, ncType: Int, begin: Long,
                         attrs: Map[String, String],
                         dimids: Seq[Int] = Nil)
  final case class NcHeader(version: Int, numrecs: Long, dims: Seq[(String, Long)],
                            attrs: Map[String, String], vars: Seq[NcVar]) {
    /** Index of the unlimited (record) dimension, if any (size 0 in the
      * header per the classic spec). */
    def unlimitedDim: Option[Int] = dims.indexWhere(_._2 == 0L) match {
      case -1 => None
      case i => Some(i)
    }
    /** A variable is a record variable iff its FIRST dimension is the
      * unlimited one (classic-format rule). */
    def isRecord(v: NcVar): Boolean =
      unlimitedDim.exists(u => v.dimids.headOption.contains(u))
    /** Elements per record = product of the non-record dimension sizes
      * (1 for a plain 1-D series). */
    def recElems(v: NcVar): Long =
      v.dimids.drop(1).map(d => dims(d)._2).product
    /** Per-record bytes of one record variable: elems × external size,
      * rounded up to a 4-byte boundary per the classic spec — EXCEPT
      * when the file has exactly ONE record variable, which packs
      * unpadded (the spec's special case for byte/short/char series). */
    def recBytes(v: NcVar): Long = {
      val raw = recElems(v) * ncSize(v.ncType)
      if (vars.count(isRecord) == 1) raw else (raw + 3) / 4 * 4
    }
    /** Bytes per record = sum over RECORD variables only (fixed-size
      * variables live before the record section and do not stride). */
    def recSize: Long = vars.filter(isRecord).map(recBytes).sum
  }
  final case class NcFile(header: NcHeader, bytes: Array[Byte]) {
    def numrecs: Int = header.numrecs.toInt
    def dims: Seq[(String, Int)] = header.dims.map { case (n, s) => (n, s.toInt) }
    def attrs: Map[String, String] = header.attrs
    def vars: Seq[NcVar] = header.vars
    def recSize: Int = header.recSize.toInt
    /** Column of a 1-D record variable as doubles. */
    def column(name: String): Array[Double] = {
      val v = vars.find(_.name == name).getOrElse(
        throw new NoSuchElementException(name))
      require(header.isRecord(v) && v.dimids.length == 1,
        s"$name is not a 1-D record variable (dims ${v.dimids})")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      Array.tabulate(numrecs) { r =>
        val off = (v.begin + r.toLong * recSize).toInt
        decodeAt(bb, off, v)
      }
    }
  }

  /** One element of `v` at absolute byte offset `off` as a double —
    * every numeric external type at its EXACT width; NC_CHAR (text)
    * throws rather than reinterpreting bytes as numbers. */
  private def decodeAt(bb: ByteBuffer, off: Int, v: NcVar): Double =
    v.ncType match {
      case NC_BYTE => bb.get(off).toDouble
      case NC_UBYTE => (bb.get(off) & 0xff).toDouble
      case NC_SHORT => bb.getShort(off).toDouble
      case NC_USHORT => (bb.getShort(off) & 0xffff).toDouble
      case NC_INT => bb.getInt(off).toDouble
      case NC_UINT => (bb.getInt(off) & 0xffffffffL).toDouble
      case NC_INT64 | NC_UINT64 => bb.getLong(off).toDouble
      case NC_FLOAT => bb.getFloat(off).toDouble
      case NC_DOUBLE => bb.getDouble(off)
      case NC_CHAR => throw new IllegalArgumentException(
        s"${v.name} is an NC_CHAR (text) variable — not numeric")
      case other => throw new IllegalArgumentException(
        s"${v.name}: unknown nc_type $other")
    }

  /** Parse a CDF-1/CDF-2/CDF-5 header from its leading bytes (the buffer
    * only needs to hold the header, not the file). */
  def parseHeader(bytes: Array[Byte]): NcHeader = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(bytes.length >= 8 && bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F' &&
      (bytes(3) == 1 || bytes(3) == 2 || bytes(3) == 5),
      "not a CDF-1/CDF-2/CDF-5 classic-family file")
    val version = bytes(3).toInt
    val v5 = version == 5
    val off64 = version >= 2
    var pos = 4
    def readSize(): Long =
      if (v5) { val v = bb.getLong(pos); pos += 8; v }
      else { val v = bb.getInt(pos).toLong; pos += 4; v }
    val numrecs = readSize()
    def readName(): String = {
      val n = readSize().toInt
      val s = new String(bytes, pos, n, "UTF-8")
      pos += n + pad4(n); s
    }
    def readAttrs(): Map[String, String] = {
      val tag = bb.getInt(pos); pos += 4
      val cnt = readSize()
      require(tag == NC_ATTRIBUTE || (tag == 0 && cnt == 0), s"bad attr tag $tag")
      (0L until cnt).map { _ =>
        val k = readName()
        val t = bb.getInt(pos); pos += 4
        val n = readSize().toInt
        // text attrs decode verbatim; numeric attrs (the _FillValue /
        // scale_factor shapes real netcdf-c files carry) render as their
        // space-joined values so every consumer keeps the Map[String,
        // String] surface
        val v = if (t == NC_CHAR) {
          val s = new String(bytes, pos, n, "UTF-8"); pos += n + pad4(n); s
        } else {
          val es = ncSize(t)
          val vals = (0 until n).map { i =>
            val off = pos + i * es
            t match {
              case NC_FLOAT => bb.getFloat(off).toDouble.toString
              case NC_DOUBLE => bb.getDouble(off).toString
              case NC_BYTE => bb.get(off).toString
              case NC_UBYTE => (bb.get(off) & 0xff).toString
              case NC_SHORT => bb.getShort(off).toString
              case NC_USHORT => (bb.getShort(off) & 0xffff).toString
              case NC_INT => bb.getInt(off).toString
              case NC_UINT => (bb.getInt(off) & 0xffffffffL).toString
              case _ => bb.getLong(off).toString
            }
          }
          pos += n * es + pad4(n * es)
          vals.mkString(" ")
        }
        k -> v
      }.toMap
    }
    val dimTag = bb.getInt(pos); pos += 4
    val ndims = readSize()
    require(dimTag == NC_DIMENSION || (dimTag == 0 && ndims == 0))
    val dims = (0L until ndims).map { _ =>
      val nm = readName(); val s = readSize(); nm -> s }
    val gatts = readAttrs()
    val varTag = bb.getInt(pos); pos += 4
    val nvars = readSize()
    require(varTag == NC_VARIABLE || (varTag == 0 && nvars == 0))
    val vars = (0L until nvars).map { _ =>
      val nm = readName()
      val nd = readSize()
      val dimids = (0L until nd).map(_ => readSize().toInt) // NON_NEG-wide
      val va = readAttrs()
      val t = bb.getInt(pos); pos += 4
      readSize() // vsize
      val begin = if (off64) { val v = bb.getLong(pos); pos += 8; v }
                  else { val v = bb.getInt(pos).toLong; pos += 4; v }
      NcVar(nm, t, begin, va, dimids)
    }
    NcHeader(version, numrecs, dims, gatts, vars)
  }

  def read(bytes: Array[Byte]): NcFile = NcFile(parseHeader(bytes), bytes)

  /** Open a file without loading its data — the header is parsed from a
    * bounded prefix read, and [[columnAt]] seeks per record. This is how a
    * sparse multi-GiB CDF-5 file (begin offsets past 2³¹) is read without
    * a multi-GiB buffer. */
  def open(path: String): NcHeader = {
    val f = new java.io.File(path)
    // headers are KBs; start small and grow on underflow so a file with an
    // unusually large header (accumulated history attrs, many vars) still
    // parses. Growth is capped at 256 MiB — far beyond any legal header,
    // and crucially BELOW Int.MaxValue so a corrupt multi-GiB sparse file
    // (the CDF-5 fixtures this module writes) errors cleanly instead of
    // wrapping size.toInt negative or buffering gigabytes to fail
    val cap = math.min(f.length(), 256L << 20)
    var size = math.min(f.length(), 1L << 20)
    while (true) {
      val buf = new Array[Byte](size.toInt)
      val in = new java.io.DataInputStream(new java.io.FileInputStream(f))
      try in.readFully(buf) finally in.close()
      try return parseHeader(buf)
      catch {
        case _ @ (_: IndexOutOfBoundsException | _: java.nio.BufferUnderflowException)
            if size < cap =>
          size = math.min(cap, size * 4)
        case e @ (_: IndexOutOfBoundsException | _: java.nio.BufferUnderflowException) =>
          throw new IllegalArgumentException(s"malformed netCDF header in $path", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Column of a 1-D record variable, fetched by per-record seeks. */
  def columnAt(path: String, h: NcHeader, name: String): Array[Double] = {
    val v = h.vars.find(_.name == name).getOrElse(
      throw new NoSuchElementException(name))
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val elemSize = ncSize(v.ncType)
      val buf = new Array[Byte](elemSize)
      Array.tabulate(h.numrecs.toInt) { r =>
        raf.seek(v.begin + r.toLong * h.recSize)
        raf.readFully(buf)
        decodeAt(ByteBuffer.wrap(buf).order(ByteOrder.BIG_ENDIAN), 0, v)
      }
    } finally raf.close()
  }
}
