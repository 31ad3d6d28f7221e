package graft.io

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/**
 * Minimal HDF5 writer/reader for the flat time-series layout — the
 * netCDF-4 side of the export surface. The reference's default output
 * engine is netCDF4/HDF5 (stglib/rsk/cdf2nc.py:145-147 passes
 * `output_format`; xarray's default backend writes NETCDF4), while
 * [[Netcdf3]] covers the classic CDF-1/CDF-5 family; anyone opening
 * outputs with h5py/HDF5-only tooling needs this container.
 *
 * Implements the public HDF5 File Format Specification (
 * https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html), earliest-libver
 * subset — the same structures libhdf5 emits for `libver='earliest'`:
 *
 *  - version-0 superblock (8-byte offsets/lengths, group k = 4/16);
 *  - one root group: version-1 object header → symbol-table message →
 *    v1 group B-tree ("TREE") → symbol node ("SNOD") → local heap
 *    ("HEAP") for link names;
 *  - one 1-D CONTIGUOUS dataset per column: v1 object header with
 *    simple dataspace, fixed-point/IEEE-float datatype (little-endian),
 *    v2 fill-value, v3 contiguous data layout, and v1 attribute
 *    messages (fixed-length ASCII strings);
 *  - the `time` column (when present) carries the netCDF-4 dimension-
 *    scale markers CLASS="DIMENSION_SCALE" / NAME="time". Full
 *    netCDF-4 dimension wiring (DIMENSION_LIST/REFERENCE_LIST) needs
 *    object-reference datatypes; without it netcdf-c still opens the
 *    file, presenting unattached variables over phony dimensions —
 *    documented boundary, plain HDF5 tools are unaffected.
 *
 * All metadata is little-endian per the spec (unlike classic netCDF's
 * big-endian XDR). Pure JVM, no native libs, like [[Netcdf3]] and the
 * [[Sqlite]] .rsk parser.
 *
 * Writer shape: one file = one deployment/profile (the upstream
 * partition decides the split, as with [[Netcdf3.write]]); rows stream
 * through `toLocalIterator` once, fanned out to per-column buffered
 * writers at their contiguous extents — no full collect, driver memory
 * is one buffer per column.
 */
object Hdf5 {

  private val Undef = -1L // all-ones address per the spec
  private val LeafK = 4
  private val InternalK = 16

  // ---- little-endian byte building ------------------------------------

  private final class Buf {
    private var arr = new Array[Byte](256)
    private var at = 0
    def pos: Int = at
    private def ensure(n: Int): Unit =
      if (at + n > arr.length) {
        arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, at + n))
      }
    def u8(v: Int): this.type = { ensure(1); arr(at) = v.toByte; at += 1; this }
    def u16(v: Int): this.type = { u8(v & 0xff); u8((v >> 8) & 0xff) }
    def u32(v: Long): this.type = {
      var i = 0; while (i < 4) { u8(((v >> (8 * i)) & 0xff).toInt); i += 1 }; this
    }
    def u64(v: Long): this.type = {
      var i = 0; while (i < 8) { u8(((v >> (8 * i)) & 0xff).toInt); i += 1 }; this
    }
    def bytes(b: Array[Byte]): this.type = {
      ensure(b.length); System.arraycopy(b, 0, arr, at, b.length)
      at += b.length; this
    }
    def pad(to: Int): this.type = { while (at % to != 0) u8(0); this }
    def result(): Array[Byte] = java.util.Arrays.copyOf(arr, at)
  }

  // ---- datatype descriptors -------------------------------------------

  private sealed trait H5Type { def size: Int }
  private case object F64 extends H5Type { val size = 8 }
  private case object I32 extends H5Type { val size = 4 }
  private case object I64 extends H5Type { val size = 8 }

  private def h5Type(dt: DataType): H5Type = dt match {
    case FloatType | DoubleType => F64
    case IntegerType | ShortType | ByteType => I32
    case LongType => I64
    case other => throw new IllegalArgumentException(
      s"HDF5 export supports numeric columns only, got ${other.simpleString}")
  }

  /** Datatype message body (class+version, 3-byte bit field, size, props). */
  private def datatypeBody(t: H5Type): Array[Byte] = {
    val b = new Buf
    t match {
      case I32 =>
        b.u8(0x10) // version 1, class 0 fixed-point
        b.u8(0x08).u8(0).u8(0) // LE, signed (bit 3)
        b.u32(4)
        b.u16(0).u16(32) // bit offset, precision
      case I64 =>
        b.u8(0x10)
        b.u8(0x08).u8(0).u8(0)
        b.u32(8)
        b.u16(0).u16(64)
      case F64 =>
        b.u8(0x11) // version 1, class 1 floating-point
        b.u8(0x20).u8(0x3f).u8(0) // LE, norm=implied, sign bit 63
        b.u32(8)
        b.u16(0).u16(64) // bit offset, precision
        b.u8(52).u8(11) // exponent location, size
        b.u8(0).u8(52) // mantissa location, size
        b.u32(1023) // exponent bias
    }
    b.result()
  }

  /** Fixed-length ASCII string datatype (class 3), NUL-padded. */
  private def stringTypeBody(n: Int): Array[Byte] = {
    val b = new Buf
    b.u8(0x13) // version 1, class 3 string
    b.u8(0).u8(0).u8(0) // null-terminate, ASCII
    b.u32(n.toLong)
    b.result()
  }

  private def scalarSpaceBody: Array[Byte] = {
    val b = new Buf
    b.u8(1).u8(0).u8(0) // version 1, rank 0, flags 0
    b.u8(0).u32(0) // reserved
    b.result()
  }

  private def vectorSpaceBody(n: Long): Array[Byte] = {
    val b = new Buf
    b.u8(1).u8(1).u8(1) // version 1, rank 1, flags: maxdims present
    b.u8(0).u32(0) // reserved
    b.u64(n).u64(n) // dim, maxdim
    b.result()
  }

  /** v1 attribute message body: name + embedded datatype/dataspace + data,
    * each of the three sections padded to 8 bytes (data unpadded). */
  private def attrBody(name: String, value: String): Array[Byte] = {
    val nb = name.getBytes("US-ASCII") :+ 0.toByte
    val vb = value.getBytes("US-ASCII")
    val dt = stringTypeBody(math.max(vb.length, 1))
    val ds = scalarSpaceBody
    val b = new Buf
    b.u8(1).u8(0) // version, reserved
    b.u16(nb.length).u16(dt.length).u16(ds.length)
    b.bytes(nb).pad(8)
    b.bytes(dt).pad(8)
    b.bytes(ds).pad(8)
    b.bytes(if (vb.isEmpty) Array[Byte](0) else vb)
    b.result()
  }

  private final case class Msg(typ: Int, body: Array[Byte])

  /** v1 object header: 12-byte prefix + 4 pad, then 8-byte-aligned
    * (type, size, flags) message records. */
  private def objectHeader(msgs: Seq[Msg]): Array[Byte] = {
    val bodies = msgs.map { m =>
      val padded = m.body ++ new Array[Byte]((8 - m.body.length % 8) % 8)
      (m.typ, padded)
    }
    val total = bodies.map(_._2.length + 8).sum
    val b = new Buf
    b.u8(1).u8(0) // version 1, reserved
    b.u16(msgs.length)
    b.u32(1) // object reference count
    b.u32(total.toLong) // header size (message section)
    b.u32(0) // pad to 8-byte boundary before first message
    for ((typ, body) <- bodies) {
      b.u16(typ).u16(body.length).u8(0).u8(0).u8(0).u8(0)
      b.bytes(body)
    }
    b.result()
  }

  // ---- public writer ---------------------------------------------------

  /** Write `df`'s numeric columns as 1-D contiguous HDF5 datasets in the
    * root group. `attrs` become root-group string attributes; `varAttrs`
    * per-dataset string attributes. Returns bytes written. */
  def write(df: DataFrame, path: String, attrs: Seq[(String, String)] = Nil,
            varAttrs: Map[String, Seq[(String, String)]] = Map.empty): Long = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "HDF5 export needs at least one column")
    val types = fields.map(f => f.name -> h5Type(f.dataType))
    val n = df.count()

    // --- local heap: offset 0 holds the null name, then link names ------
    val heapData = new Buf
    heapData.u64(0) // the empty string slot readers expect at offset 0
    val nameOff = fields.map { f =>
      val off = heapData.pos
      heapData.bytes(f.name.getBytes("US-ASCII")).u8(0).pad(8)
      f.name -> off.toLong
    }.toMap
    val heapSegSize = heapData.pos.toLong

    // --- per-dataset object headers (addresses patched in second pass) --
    def dsHeader(name: String, t: H5Type, dataAddr: Long): Array[Byte] = {
      val extra = varAttrs.getOrElse(name, Nil) ++
        (if (name == "time")
           Seq("CLASS" -> "DIMENSION_SCALE", "NAME" -> "time")
         else Nil)
      val msgs = Seq(
        Msg(0x0001, vectorSpaceBody(n)),
        Msg(0x0003, datatypeBody(t)),
        Msg(0x0005, { val b = new Buf; b.u8(2).u8(1).u8(2).u8(0); b.result() }),
        Msg(0x0008, { val b = new Buf
          b.u8(3).u8(1) // version 3, contiguous
          b.u64(dataAddr).u64(n * t.size); b.result() })
      ) ++ extra.map { case (k, v) => Msg(0x000c, attrBody(k, v)) }
      objectHeader(msgs)
    }

    // --- fixed-size group structures ------------------------------------
    val btreeSize = 24 + (2 * LeafK + 1) * 8 + 2 * LeafK * 8
    val snodSize = 8 + 2 * LeafK * 40
    val heapHdrSize = 32

    // --- address assignment (sequential layout) -------------------------
    var at = 96L // superblock + root symbol-table entry
    val rootHeader0 = objectHeader(Seq(
      Msg(0x0011, { val b = new Buf; b.u64(0).u64(0); b.result() })) ++
      attrs.map { case (k, v) => Msg(0x000c, attrBody(k, v)) })
    val rootAddr = at; at += rootHeader0.length
    val btreeAddr = at; at += btreeSize
    val snodAddr = at; at += snodSize
    val heapHdrAddr = at; at += heapHdrSize
    val heapSegAddr = at; at += heapSegSize
    // dataset headers have fixed size given message shapes — measure with a
    // placeholder address, then assign
    val dsHdrSizes = types.map { case (nm, t) => nm -> dsHeader(nm, t, 0L).length }
    val dsHdrAddr = types.map { case (nm, _) =>
      val a = at; at += dsHdrSizes.find(_._1 == nm).get._2; nm -> a
    }.toMap
    val dataAddr = types.map { case (nm, t) =>
      val a = at; at += n * t.size; nm -> a
    }.toMap
    val eof = at

    val raf = new RandomAccessFile(path, "rw")
    try {
      raf.setLength(0)
      // --- superblock v0 ------------------------------------------------
      val sb = new Buf
      sb.bytes(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
      sb.u8(0).u8(0).u8(0).u8(0) // sb/freespace/symtable versions + reserved
      sb.u8(0) // shared header message version
      sb.u8(8).u8(8).u8(0) // size of offsets, lengths, reserved
      sb.u16(LeafK).u16(InternalK)
      sb.u32(0) // file consistency flags
      sb.u64(0).u64(Undef).u64(eof).u64(Undef)
      // root group symbol table entry
      sb.u64(0).u64(rootAddr)
      sb.u32(1).u32(0) // cache type 1 (group), reserved
      sb.u64(btreeAddr).u64(heapHdrAddr) // scratch: cached btree + heap
      require(sb.pos == 96, s"superblock layout drifted: ${sb.pos}")
      raf.write(sb.result())

      // --- root object header -------------------------------------------
      val rootHeader = objectHeader(Seq(
        Msg(0x0011, { val b = new Buf; b.u64(btreeAddr).u64(heapHdrAddr); b.result() })) ++
        attrs.map { case (k, v) => Msg(0x000c, attrBody(k, v)) })
      require(rootHeader.length == rootHeader0.length, "root header drifted")
      raf.seek(rootAddr); raf.write(rootHeader)

      // --- group B-tree (single leaf) -----------------------------------
      val bt = new Buf
      bt.bytes("TREE".getBytes("US-ASCII"))
      bt.u8(0).u8(0) // node type 0 (group), level 0
      bt.u16(1) // entries used
      bt.u64(Undef).u64(Undef) // siblings
      bt.u64(0) // key 0: heap offset of the null name
      bt.u64(snodAddr) // child 0
      bt.u64(nameOff(types.map(_._1).max)) // key 1: greatest link name
      while (bt.pos < btreeSize) bt.u8(0)
      raf.seek(btreeAddr); raf.write(bt.result())

      // --- symbol node (entries sorted by link name) --------------------
      val sn = new Buf
      sn.bytes("SNOD".getBytes("US-ASCII"))
      sn.u8(1).u8(0) // version, reserved
      sn.u16(types.length)
      for (nm <- types.map(_._1).sorted) {
        sn.u64(nameOff(nm)).u64(dsHdrAddr(nm))
        sn.u32(0).u32(0) // no cache
        sn.u64(0).u64(0) // scratch
      }
      while (sn.pos < snodSize) sn.u8(0)
      raf.seek(snodAddr); raf.write(sn.result())

      // --- local heap ---------------------------------------------------
      val hp = new Buf
      hp.bytes("HEAP".getBytes("US-ASCII"))
      hp.u8(0).u8(0).u8(0).u8(0) // version, reserved
      hp.u64(heapSegSize)
      hp.u64(1) // free list: none (offset 1 sentinel, as libhdf5 writes)
      hp.u64(heapSegAddr)
      require(hp.pos == heapHdrSize, "heap header drifted")
      raf.seek(heapHdrAddr); raf.write(hp.result())
      raf.seek(heapSegAddr); raf.write(heapData.result())

      // --- dataset object headers ---------------------------------------
      for ((nm, t) <- types) {
        val h = dsHeader(nm, t, dataAddr(nm))
        require(h.length == dsHdrSizes.find(_._1 == nm).get._2, s"$nm header drifted")
        raf.seek(dsHdrAddr(nm)); raf.write(h)
      }

      // --- data: stream rows once, fan out to per-column extents --------
      val writers = types.zipWithIndex.map { case ((nm, t), i) =>
        new ColumnWriter(raf, dataAddr(nm), t, i)
      }
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        var i = 0
        while (i < writers.length) { writers(i).add(row); i += 1 }
      }
      writers.foreach(_.flush())
      eof
    } finally raf.close()
  }

  /** Buffered column writer: accumulates little-endian values, flushing
    * 64 KiB extents at the column's own file offset. */
  private final class ColumnWriter(raf: RandomAccessFile, start: Long,
                                   t: H5Type, fieldIdx: Int) {
    private val buf = ByteBuffer.allocate(64 * 1024).order(ByteOrder.LITTLE_ENDIAN)
    private var written = 0L
    def add(row: org.apache.spark.sql.Row): Unit = {
      if (buf.remaining() < 8) flush()
      if (row.isNullAt(fieldIdx)) t match {
        case F64 => buf.putDouble(Double.NaN)
        case I32 => buf.putInt(Int.MinValue)
        case I64 => buf.putLong(Long.MinValue)
      } else t match {
        case F64 => buf.putDouble(row.get(fieldIdx) match {
          case f: Float => f.toDouble
          case d: Double => d
          case x: Number => x.doubleValue()
        })
        case I32 => buf.putInt(row.get(fieldIdx) match {
          case x: Number => x.intValue()
        })
        case I64 => buf.putLong(row.getLong(fieldIdx))
      }
    }
    def flush(): Unit = if (buf.position() > 0) {
      raf.seek(start + written)
      raf.write(buf.array(), 0, buf.position())
      written += buf.position()
      buf.clear()
    }
  }

  // ---- reader ----------------------------------------------------------

  final case class H5Dataset(name: String, dtype: String, n: Long,
                             dataAddr: Long, attrs: Map[String, String])
  final case class H5File(attrs: Map[String, String], datasets: Seq[H5Dataset])

  private final class Rd(val b: Array[Byte]) {
    def u8(at: Int): Int = b(at) & 0xff
    def u16(at: Int): Int = u8(at) | (u8(at + 1) << 8)
    def u32(at: Int): Long = (0 until 4).map(i => u8(at + i).toLong << (8 * i)).sum
    def u64(at: Int): Long = (0 until 8).map(i => u8(at + i).toLong << (8 * i)).sum
    def ascii(at: Int, n: Int) = new String(b, at, n, "US-ASCII")
    def cstr(at: Int): String = {
      var e = at; while (b(e) != 0) e += 1; ascii(at, e - at)
    }
  }

  /** Parse the subset this writer emits (v0 superblock, v1 headers, one
    * SNOD leaf, contiguous layout). Structural deviations throw. */
  def open(bytes: Array[Byte]): H5File = {
    val r = new Rd(bytes)
    require(r.ascii(1, 3) == "HDF" && r.u8(0) == 0x89, "not an HDF5 file")
    require(r.u8(8) == 0, s"superblock version ${r.u8(8)} unsupported")
    require(r.u8(13) == 8 && r.u8(14) == 8, "expected 8-byte offsets/lengths")
    val rootOH = r.u64(56 + 8)

    final case class Parsed(msgs: Seq[(Int, Int)]) // (type, body offset)
    def parseHeader(at: Long): Seq[(Int, Int, Int)] = {
      require(r.u8(at.toInt) == 1, s"object header version at $at")
      val nMsgs = r.u16(at.toInt + 2)
      var o = at.toInt + 16
      (0 until nMsgs).map { _ =>
        val typ = r.u16(o); val sz = r.u16(o + 2)
        val rec = (typ, o + 8, sz)
        o += 8 + sz
        rec
      }
    }
    def parseAttr(at: Int): (String, String) = {
      require(r.u8(at) == 1, "attribute message version")
      val nameSz = r.u16(at + 2); val dtSz = r.u16(at + 4); val dsSz = r.u16(at + 6)
      def pad8(x: Int) = x + (8 - x % 8) % 8
      val nameAt = at + 8
      val name = r.cstr(nameAt)
      val dtAt = nameAt + pad8(nameSz)
      require((r.u8(dtAt) & 0x0f) == 3, "attribute datatype is not a string")
      val strLen = r.u32(dtAt + 4).toInt
      val dataAt = dtAt + pad8(dtSz) + pad8(dsSz)
      val raw = r.ascii(dataAt, strLen)
      (name, raw.takeWhile(_ != 0.toChar))
    }

    val rootMsgs = parseHeader(rootOH)
    val rootAttrs = rootMsgs.collect { case (0x000c, o, _) => parseAttr(o) }.toMap
    val (btreeAddr, heapHdrAddr) = rootMsgs.find(_._1 == 0x0011) match {
      case Some((_, o, _)) => (r.u64(o), r.u64(o + 8))
      case None => throw new IllegalArgumentException("root has no symbol table")
    }
    val heapSegAddr = r.u64(heapHdrAddr.toInt + 24)

    require(r.ascii(btreeAddr.toInt, 4) == "TREE", "group B-tree signature")
    require(r.u8(btreeAddr.toInt + 5) == 0, "multi-level group B-tree unsupported")
    val nChildren = r.u16(btreeAddr.toInt + 6)
    val snodAddrs = (0 until nChildren).map(i =>
      r.u64(btreeAddr.toInt + 24 + 8 + i * 16))

    val datasets = snodAddrs.flatMap { sa =>
      require(r.ascii(sa.toInt, 4) == "SNOD", "symbol node signature")
      val nSyms = r.u16(sa.toInt + 6)
      (0 until nSyms).map { i =>
        val e = sa.toInt + 8 + i * 40
        val name = r.cstr((heapSegAddr + r.u64(e)).toInt)
        val oh = r.u64(e + 8)
        val msgs = parseHeader(oh)
        var n = -1L; var dataAddr = -1L; var dtype = "unknown"
        val attrs = scala.collection.mutable.Map[String, String]()
        for ((typ, o, _) <- msgs) typ match {
          case 0x0001 =>
            require(r.u8(o + 1) == 1, "rank != 1")
            n = r.u64(o + 8)
          case 0x0003 =>
            val cls = r.u8(o) & 0x0f
            val sz = r.u32(o + 4).toInt
            dtype = (cls, sz) match {
              case (0, 4) => "i32"
              case (0, 8) => "i64"
              case (1, 8) => "f64"
              case other => s"class$other"
            }
          case 0x0008 =>
            require(r.u8(o) == 3 && r.u8(o + 1) == 1, "layout not v3 contiguous")
            dataAddr = r.u64(o + 2)
          case 0x000c =>
            val (k, v) = parseAttr(o); attrs(k) = v
          case _ => ()
        }
        H5Dataset(name, dtype, n, dataAddr, attrs.toMap)
      }
    }
    H5File(rootAttrs, datasets)
  }

  /** Decode a dataset's contiguous extent as doubles. */
  def column(bytes: Array[Byte], ds: H5Dataset): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes, ds.dataAddr.toInt,
      (ds.n * (if (ds.dtype == "i32") 4 else 8)).toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    ds.dtype match {
      case "f64" => Array.fill(ds.n.toInt)(bb.getDouble())
      case "i32" => Array.fill(ds.n.toInt)(bb.getInt().toDouble)
      case "i64" => Array.fill(ds.n.toInt)(bb.getLong().toDouble)
      case other => throw new IllegalArgumentException(s"dtype $other")
    }
  }
}
