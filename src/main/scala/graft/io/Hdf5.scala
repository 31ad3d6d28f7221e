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
 *  - the `time` column (when present, alongside data variables) carries
 *    the FULL netCDF-4 dimension wiring: CLASS="DIMENSION_SCALE" /
 *    NAME="time" / _Netcdf4Dimid plus the H5DS attachment attributes —
 *    REFERENCE_LIST (compound {object reference, dim index} per data
 *    variable) on the coordinate and DIMENSION_LIST (vlen of object
 *    references through a global heap collection) on each data
 *    variable, byte-shape-identical to netcdf-c 4.5.0 output (verified
 *    against reference examples/gndcrmet.nc) — so netcdf-c attaches
 *    variables to the time dimension instead of phony dimensions.
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
  private def attrBodyRaw(name: String, dt: Array[Byte], ds: Array[Byte],
                          data: Array[Byte]): Array[Byte] = {
    val nb = name.getBytes("US-ASCII") :+ 0.toByte
    val b = new Buf
    b.u8(1).u8(0) // version, reserved
    b.u16(nb.length).u16(dt.length).u16(ds.length)
    b.bytes(nb).pad(8)
    b.bytes(dt).pad(8)
    b.bytes(ds).pad(8)
    b.bytes(data)
    b.result()
  }

  private def attrBody(name: String, value: String): Array[Byte] = {
    val vb = value.getBytes("US-ASCII")
    attrBodyRaw(name, stringTypeBody(math.max(vb.length, 1)), scalarSpaceBody,
      if (vb.isEmpty) Array[Byte](0) else vb)
  }

  // ---- netCDF-4 dimension wiring (HDF5 dimension scales, H5DS) --------
  // Byte shapes verified against real netcdf-c 4.5.0 output
  // (reference examples/gndcrmet.nc): the coordinate variable carries
  // _Netcdf4Dimid + REFERENCE_LIST (compound {objref, i32} per referer);
  // each data variable carries DIMENSION_LIST (vlen of object refs via a
  // global heap collection). With these, netcdf-c attaches variables to
  // the time dimension instead of presenting phony dimensions.

  /** Object-reference datatype (class 7, 8 bytes). */
  private def refTypeBody: Array[Byte] = {
    val b = new Buf
    b.u8(0x17).u8(0).u8(0).u8(0).u32(8)
    b.result()
  }

  /** The REFERENCE_LIST compound datatype {dataset: objref @0,
    * dimension: i32 @8}, declared size 16 (116 bytes total, matching
    * netcdf-c). */
  private def refListTypeBody: Array[Byte] = {
    val b = new Buf
    b.u8(0x16).u8(2).u8(0).u8(0) // version 1 class 6; 2 members
    b.u32(16)
    def member(name: String, off: Int, t: Array[Byte]): Unit = {
      b.bytes(name.getBytes("US-ASCII")).u8(0).pad(8)
      b.u32(off.toLong)
      b.u8(0) // dimensionality
      b.u8(0).u8(0).u8(0) // reserved
      b.u32(0) // permutation
      b.u32(0) // reserved
      b.u32(0).u32(0).u32(0).u32(0) // dim sizes
      b.bytes(t)
    }
    member("dataset", 0, refTypeBody)
    member("dimension", 8, datatypeBody(I32))
    b.result()
  }

  /** vlen-of-object-reference datatype (class 9 sequence, 16 bytes). */
  private def vlenRefTypeBody: Array[Byte] = {
    val b = new Buf
    b.u8(0x19).u8(0).u8(0).u8(0) // version 1 class 9, sequence
    b.u32(16)
    b.bytes(refTypeBody)
    b.result()
  }

  /** _Netcdf4Dimid = 0 (i32 scalar). */
  private def dimidAttr: Array[Byte] = {
    val b = new Buf; b.u32(0)
    attrBodyRaw("_Netcdf4Dimid", datatypeBody(I32), scalarSpaceBody, b.result())
  }

  /** REFERENCE_LIST on the coordinate variable: one {referer header
    * address, dim index 0} element per data variable (16 bytes each). */
  private def referenceListAttr(referers: Seq[Long]): Array[Byte] = {
    val b = new Buf
    referers.foreach { a => b.u64(a).u32(0).u32(0) }
    attrBodyRaw("REFERENCE_LIST", refListTypeBody,
      vectorSpaceBody(referers.length.toLong), b.result())
  }

  /** DIMENSION_LIST on a data variable: a 1-element vlen whose payload
    * (one ref to the coordinate's header) lives in the global heap at
    * (gcolAddr, index). */
  private def dimensionListAttr(gcolAddr: Long, index: Int): Array[Byte] = {
    val b = new Buf
    b.u32(1).u64(gcolAddr).u32(index.toLong)
    attrBodyRaw("DIMENSION_LIST", vlenRefTypeBody, vectorSpaceBody(1), b.result())
  }

  /** Global heap collection holding one 8-byte object reference per data
    * variable (heap object indexes 1..n), with the free-space terminator
    * object. */
  private def gcolBytes(refs: Seq[Long]): Array[Byte] = {
    val b = new Buf
    b.bytes("GCOL".getBytes("US-ASCII"))
    b.u8(1).u8(0).u8(0).u8(0)
    b.u64(16L + refs.length * 24L + 16L) // collection size incl. header
    refs.zipWithIndex.foreach { case (r, i) =>
      b.u16(i + 1).u16(1).u32(0).u64(8L) // index, refcount, reserved, size
      b.u64(r)
    }
    b.u16(0).u16(0).u32(0).u64(16L) // free-space object
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

  /** Shared file scaffolding for both writers: local heap + link names,
    * root/group structures, sequential address layout, netCDF-4 dimension
    * wiring, and the common write-out — each writer supplies only its
    * layout/filter messages and its data section, so a container fix
    * lands in both export layouts at once. */
  private final class Container(types: Seq[(String, H5Type)],
                                attrs: Seq[(String, String)],
                                varAttrs: Map[String, Seq[(String, String)]],
                                n: Long) {
    val heapData = new Buf
    heapData.u64(0) // the empty string slot readers expect at offset 0
    val nameOff: Map[String, Long] = types.map { case (nm, _) =>
      val off = heapData.pos
      heapData.bytes(nm.getBytes("US-ASCII")).u8(0).pad(8)
      nm -> off.toLong
    }.toMap
    val heapSegSize: Long = heapData.pos.toLong
    val dataVars: Seq[String] = types.map(_._1).filter(_ != "time")
    val wired: Boolean = types.exists(_._1 == "time") && dataVars.nonEmpty

    val btreeSize = 24 + (2 * LeafK + 1) * 8 + 2 * LeafK * 8
    val snodSize = 8 + 2 * LeafK * 40
    val heapHdrSize = 32

    // a SNOD leaf holds at most 2·LeafK links and the single leaf-level
    // B-tree node at most 2·LeafK children, so chunking the sorted links
    // across several SNODs lifts the link cap from 8 to 64; past that,
    // fail LOUDLY instead of overrunning the fixed layout
    val snodChunks: Seq[Seq[String]] =
      types.map(_._1).sorted.grouped(2 * LeafK).toSeq
    require(snodChunks.length <= 2 * LeafK,
      s"${types.length} variables exceed the ${2 * LeafK * 2 * LeafK}-link " +
        "single-node group B-tree this writer emits")

    private val rootHeader0 = objectHeader(Seq(
      Msg(0x0011, { val b = new Buf; b.u64(0).u64(0); b.result() })) ++
      attrs.map { case (k, v) => Msg(0x000c, attrBody(k, v)) })

    // sequential address cursor; writers keep allocating from `at`
    var at: Long = 96L // superblock + root symbol-table entry
    val rootAddr = at; at += rootHeader0.length
    val btreeAddr = at; at += btreeSize
    val snodAddr = at; at += snodChunks.length.toLong * snodSize
    val heapHdrAddr = at; at += heapHdrSize
    val heapSegAddr = at; at += heapSegSize
    val gcolAddr = at
    if (wired) at += 16L + dataVars.length * 24L + 16L

    /** Dataset object header: shared dataspace/datatype/fill + the
      * writer's layout-specific messages + attrs + wiring attrs. Message
      * shapes are fixed-width in all addresses, so a placeholder build
      * measures the exact final size. */
    def dsHeader(name: String, t: H5Type, layoutMsgs: Seq[Msg],
                 dimAttrs: Seq[Array[Byte]]): Array[Byte] = {
      val extra = varAttrs.getOrElse(name, Nil) ++
        (if (name == "time")
           Seq("CLASS" -> "DIMENSION_SCALE", "NAME" -> "time")
         else Nil)
      objectHeader(Seq(
        Msg(0x0001, vectorSpaceBody(n)),
        Msg(0x0003, datatypeBody(t)),
        Msg(0x0005, { val b = new Buf; b.u8(2).u8(1).u8(2).u8(0); b.result() })) ++
        layoutMsgs ++
        extra.map { case (k, v) => Msg(0x000c, attrBody(k, v)) } ++
        dimAttrs.map(Msg(0x000c, _)))
    }

    def dimAttrsFor(name: String, refAddrs: Seq[Long]): Seq[Array[Byte]] =
      if (!wired) Nil
      else if (name == "time") Seq(dimidAttr, referenceListAttr(refAddrs))
      else Seq(dimensionListAttr(gcolAddr, dataVars.indexOf(name) + 1))

    /** Superblock, root header, group B-tree/SNOD, local heap, and (when
      * wired) the DIMENSION_LIST global heap. */
    def writeCommon(raf: RandomAccessFile, eof: Long,
                    dsHdrAddr: Map[String, Long]): Unit = {
      raf.setLength(0)
      val sb = new Buf
      sb.bytes(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
      sb.u8(0).u8(0).u8(0).u8(0) // sb/freespace/symtable versions + reserved
      sb.u8(0) // shared header message version
      sb.u8(8).u8(8).u8(0) // size of offsets, lengths, reserved
      sb.u16(LeafK).u16(InternalK)
      sb.u32(0) // file consistency flags
      sb.u64(0).u64(Undef).u64(eof).u64(Undef)
      sb.u64(0).u64(rootAddr) // root group symbol table entry
      sb.u32(1).u32(0) // cache type 1 (group), reserved
      sb.u64(btreeAddr).u64(heapHdrAddr) // scratch: cached btree + heap
      require(sb.pos == 96, s"superblock layout drifted: " + sb.pos)
      raf.write(sb.result())

      val rootHeader = objectHeader(Seq(
        Msg(0x0011, { val b = new Buf; b.u64(btreeAddr).u64(heapHdrAddr); b.result() })) ++
        attrs.map { case (k, v) => Msg(0x000c, attrBody(k, v)) })
      require(rootHeader.length == rootHeader0.length, "root header drifted")
      raf.seek(rootAddr); raf.write(rootHeader)

      val bt = new Buf
      bt.bytes("TREE".getBytes("US-ASCII"))
      bt.u8(0).u8(0) // node type 0 (group), level 0
      bt.u16(snodChunks.length) // entries used = SNOD children
      bt.u64(Undef).u64(Undef) // siblings
      bt.u64(0) // key 0: heap offset of the null name
      for ((ch, i) <- snodChunks.zipWithIndex) {
        bt.u64(snodAddr + i.toLong * snodSize) // child i
        bt.u64(nameOff(ch.max)) // key i+1: child's greatest link name
      }
      while (bt.pos < btreeSize) bt.u8(0)
      raf.seek(btreeAddr); raf.write(bt.result())

      for ((ch, i) <- snodChunks.zipWithIndex) {
        val sn = new Buf
        sn.bytes("SNOD".getBytes("US-ASCII"))
        sn.u8(1).u8(0) // version, reserved
        sn.u16(ch.length)
        for (nm <- ch) {
          sn.u64(nameOff(nm)).u64(dsHdrAddr(nm))
          sn.u32(0).u32(0) // no cache
          sn.u64(0).u64(0) // scratch
        }
        while (sn.pos < snodSize) sn.u8(0)
        raf.seek(snodAddr + i.toLong * snodSize); raf.write(sn.result())
      }

      val hp = new Buf
      hp.bytes("HEAP".getBytes("US-ASCII"))
      hp.u8(0).u8(0).u8(0).u8(0) // version, reserved
      hp.u64(heapSegSize)
      hp.u64(1) // free list: none (offset 1 sentinel, as libhdf5 writes)
      hp.u64(heapSegAddr)
      require(hp.pos == heapHdrSize, "heap header drifted")
      raf.seek(heapHdrAddr); raf.write(hp.result())
      raf.seek(heapSegAddr); raf.write(heapData.result())

      if (wired) {
        raf.seek(gcolAddr)
        raf.write(gcolBytes(dataVars.map(_ => dsHdrAddr("time"))))
      }
    }
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

    val c = new Container(types, attrs, varAttrs, n)
    def hdr(nm: String, t: H5Type, dAddr: Long, refAddrs: Seq[Long]): Array[Byte] =
      c.dsHeader(nm, t, Seq(Msg(0x0008, { val b = new Buf
        b.u8(3).u8(1) // version 3, contiguous
        b.u64(dAddr).u64(n * t.size); b.result() })),
        c.dimAttrsFor(nm, refAddrs))
    // dataset headers have fixed size given message shapes — measure with
    // placeholder addresses, then assign
    val dsHdrSizes = types.map { case (nm, t) =>
      nm -> hdr(nm, t, 0L, c.dataVars.map(_ => 0L)).length
    }
    val dsHdrAddr = types.map { case (nm, _) =>
      val a = c.at; c.at += dsHdrSizes.find(_._1 == nm).get._2; nm -> a
    }.toMap
    val dataAddr = types.map { case (nm, t) =>
      val a = c.at; c.at += n * t.size; nm -> a
    }.toMap
    val eof = c.at

    val raf = new RandomAccessFile(path, "rw")
    try {
      c.writeCommon(raf, eof, dsHdrAddr)

      // --- dataset object headers ---------------------------------------
      for ((nm, t) <- types) {
        val h = hdr(nm, t, dataAddr(nm), c.dataVars.map(dsHdrAddr))
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

  /** Nested-group variant of [[write]]: each (name, df) pair becomes one
    * SUBGROUP under root — a v1 object header with a symbol-table message
    * pointing at the group's own B-tree/SNOD/local-heap trio, exactly the
    * old-style layout libhdf5 emits for `nc.createGroup()` with
    * libver='earliest' — holding that frame's numeric columns as 1-D
    * contiguous datasets. `attrs` become root attrs; `varAttrs` is keyed
    * "group/var". Round-trips through [[open]]'s recursive group walk
    * (datasets surface as "group/var"). Root carries only group links (the
    * netCDF-4 nested-group shape the reference's multi-dataset products
    * use); per-group H5DS dimension wiring is left to the flat writer. */
  def writeGroups(path: String, groups: Seq[(String, DataFrame)],
                  attrs: Seq[(String, String)] = Nil,
                  varAttrs: Map[String, Seq[(String, String)]] = Map.empty): Long = {
    require(groups.nonEmpty, "writeGroups needs at least one group")
    require(groups.map(_._1).distinct.length == groups.length,
      "duplicate group names")
    val btreeSize = 24 + (2 * LeafK + 1) * 8 + 2 * LeafK * 8
    val snodSize = 8 + 2 * LeafK * 40
    val heapHdrSize = 32

    def mkHeap(names: Seq[String]): (Buf, Map[String, Long]) = {
      val b = new Buf; b.u64(0) // empty-string slot at offset 0
      val offs = names.map { nm =>
        val o = b.pos.toLong
        b.bytes(nm.getBytes("US-ASCII")).u8(0).pad(8)
        nm -> o
      }.toMap
      (b, offs)
    }
    final case class GPlan(name: String, fields: Seq[(String, H5Type)],
                           n: Long, heap: Buf, nameOff: Map[String, Long])
    val plans = groups.map { case (gname, df) =>
      val fs = df.schema.fields.toSeq.map(f => f.name -> h5Type(f.dataType))
      require(fs.nonEmpty, s"group $gname has no columns")
      val (h, o) = mkHeap(fs.map(_._1))
      GPlan(gname, fs, df.count(), h, o)
    }
    val (rootHeap, rootNameOff) = mkHeap(plans.map(_.name))

    def symMsg(bt: Long, hp: Long) =
      Msg(0x0011, { val b = new Buf; b.u64(bt).u64(hp); b.result() })
    def rootHdr(bt: Long, hp: Long) = objectHeader(symMsg(bt, hp) +:
      attrs.map { case (k, v) => Msg(0x000c, attrBody(k, v)) })
    def grpHdr(bt: Long, hp: Long) = objectHeader(Seq(symMsg(bt, hp)))
    def dsHdr(g: String, nm: String, t: H5Type, n: Long, dAddr: Long) =
      objectHeader(Seq(
        Msg(0x0001, vectorSpaceBody(n)),
        Msg(0x0003, datatypeBody(t)),
        Msg(0x0005, { val b = new Buf; b.u8(2).u8(1).u8(2).u8(0); b.result() }),
        Msg(0x0008, { val b = new Buf
          b.u8(3).u8(1) // version 3, contiguous
          b.u64(dAddr).u64(n * t.size); b.result() })) ++
        varAttrs.getOrElse(s"$g/$nm", Nil)
          .map { case (k, v) => Msg(0x000c, attrBody(k, v)) })

    // a SNOD leaf holds ≤ 2·LeafK links, the leaf-level B-tree node
    // ≤ 2·LeafK SNOD children → 64-link cap per symbol table; past it,
    // fail loudly instead of overrunning the fixed layout
    def snodCount(nLinks: Int): Int = {
      val c = math.max(1, (nLinks + 2 * LeafK - 1) / (2 * LeafK))
      require(c <= 2 * LeafK,
        s"$nLinks links exceed the ${2 * LeafK * 2 * LeafK}-link " +
          "single-node group B-tree this writer emits")
      c
    }
    // fixed-width messages: placeholder builds measure exact final sizes
    var at = 96L
    val rootHdrAddr = at; at += rootHdr(0, 0).length
    val rootBtreeAddr = at; at += btreeSize
    val rootSnodAddr = at; at += snodCount(plans.length).toLong * snodSize
    val rootHeapHdrAddr = at; at += heapHdrSize
    val rootHeapSegAddr = at; at += rootHeap.pos
    val gAddrs = plans.map { p =>
      val hdrA = at; at += grpHdr(0, 0).length
      val btA = at; at += btreeSize
      val snA = at; at += snodCount(p.fields.length).toLong * snodSize
      val hhA = at; at += heapHdrSize
      val hsA = at; at += p.heap.pos
      p.name -> ((hdrA, btA, snA, hhA, hsA))
    }.toMap
    val dsAddrs = plans.flatMap { p =>
      p.fields.map { case (nm, t) =>
        val a = at; at += dsHdr(p.name, nm, t, p.n, 0L).length
        (p.name, nm) -> a
      }
    }.toMap
    val dataAddrs = plans.flatMap { p =>
      p.fields.map { case (nm, t) =>
        val a = at; at += p.n * t.size
        (p.name, nm) -> a
      }
    }.toMap
    val eof = at

    val raf = new RandomAccessFile(path, "rw")
    try {
      raf.setLength(0)
      val sb = new Buf
      sb.bytes(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
      sb.u8(0).u8(0).u8(0).u8(0)
      sb.u8(0)
      sb.u8(8).u8(8).u8(0)
      sb.u16(LeafK).u16(InternalK)
      sb.u32(0)
      sb.u64(0).u64(Undef).u64(eof).u64(Undef)
      sb.u64(0).u64(rootHdrAddr)
      sb.u32(1).u32(0) // cache type 1 (group)
      sb.u64(rootBtreeAddr).u64(rootHeapHdrAddr)
      require(sb.pos == 96, "superblock layout drifted: " + sb.pos)
      raf.write(sb.result())

      def writeSymTable(btA: Long, snA: Long, hhA: Long, hsA: Long,
                        heap: Buf, nameOff: Map[String, Long],
                        entries: Seq[(String, Long)]): Unit = {
        val chunks = entries.sortBy(_._1).grouped(2 * LeafK).toSeq
        val bt = new Buf
        bt.bytes("TREE".getBytes("US-ASCII"))
        bt.u8(0).u8(0)
        bt.u16(chunks.length) // entries used = SNOD children
        bt.u64(Undef).u64(Undef)
        bt.u64(0) // key 0: heap offset of the null name
        for ((ch, i) <- chunks.zipWithIndex) {
          bt.u64(snA + i.toLong * snodSize) // child i
          bt.u64(nameOff(ch.map(_._1).max)) // key i+1: greatest link name
        }
        while (bt.pos < btreeSize) bt.u8(0)
        raf.seek(btA); raf.write(bt.result())
        for ((ch, i) <- chunks.zipWithIndex) {
          val sn = new Buf
          sn.bytes("SNOD".getBytes("US-ASCII"))
          sn.u8(1).u8(0)
          sn.u16(ch.length)
          for ((nm, hdrAddr) <- ch) {
            sn.u64(nameOff(nm)).u64(hdrAddr)
            sn.u32(0).u32(0) // no cache
            sn.u64(0).u64(0)
          }
          while (sn.pos < snodSize) sn.u8(0)
          raf.seek(snA + i.toLong * snodSize); raf.write(sn.result())
        }
        val hp = new Buf
        hp.bytes("HEAP".getBytes("US-ASCII"))
        hp.u8(0).u8(0).u8(0).u8(0)
        hp.u64(heap.pos.toLong)
        hp.u64(1)
        hp.u64(hsA)
        require(hp.pos == heapHdrSize, "heap header drifted")
        raf.seek(hhA); raf.write(hp.result())
        raf.seek(hsA); raf.write(heap.result())
      }

      val rh = rootHdr(rootBtreeAddr, rootHeapHdrAddr)
      raf.seek(rootHdrAddr); raf.write(rh)
      writeSymTable(rootBtreeAddr, rootSnodAddr, rootHeapHdrAddr,
        rootHeapSegAddr, rootHeap, rootNameOff,
        plans.map(p => p.name -> gAddrs(p.name)._1))
      for (p <- plans) {
        val (hdrA, btA, snA, hhA, hsA) = gAddrs(p.name)
        raf.seek(hdrA); raf.write(grpHdr(btA, hhA))
        writeSymTable(btA, snA, hhA, hsA, p.heap, p.nameOff,
          p.fields.map { case (nm, _) => nm -> dsAddrs((p.name, nm)) })
      }
      for (p <- plans; (nm, t) <- p.fields) {
        val h = dsHdr(p.name, nm, t, p.n, dataAddrs((p.name, nm)))
        raf.seek(dsAddrs((p.name, nm))); raf.write(h)
      }
      for ((gname, df) <- groups) {
        val p = plans.find(_.name == gname).get
        val writers = p.fields.zipWithIndex.map { case ((nm, t), i) =>
          new ColumnWriter(raf, dataAddrs((gname, nm)), t, i)
        }
        val it = df.toLocalIterator()
        while (it.hasNext) {
          val row = it.next()
          var i = 0
          while (i < writers.length) { writers(i).add(row); i += 1 }
        }
        writers.foreach(_.flush())
      }
      eof
    } finally raf.close()
  }

  /** Chunked + DEFLATE variant of [[write]] — the layout netCDF-4 tools
    * emit when compression is requested (and the read-side counterpart to
    * the chunked/deflate support in [[open]]/[[column]]): per column, a
    * v3 class-2 chunked layout message + a v1 filter-pipeline message
    * (deflate, client data = [level]) + a single-leaf v1 chunk B-tree
    * over zlib-compressed chunks.
    *
    * Chunk count is bounded (≤ 48 per dataset) so one leaf node always
    * suffices; compressed chunks are buffered in driver memory before the
    * single sequential file write — fine for the bounded clean-product
    * sink this exporter serves (the raw 100 TB path is parquet).
    */
  def writeChunked(df: DataFrame, path: String,
                   attrs: Seq[(String, String)] = Nil,
                   varAttrs: Map[String, Seq[(String, String)]] = Map.empty,
                   deflateLevel: Int = 4, chunkElems0: Int = 0): Long = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "HDF5 export needs at least one column")
    val types = fields.map(f => f.name -> h5Type(f.dataType))
    val n = df.count()
    // bounded clean-product sink: a single-leaf chunk B-tree holds a
    // bounded entry count, and chunk buffers must fit an Int byte count
    require(n <= Int.MaxValue.toLong * 48,
      s"writeChunked is the bounded product sink, got $n rows (use parquet)")
    val chunkElems = if (chunkElems0 > 0) chunkElems0
      else math.max(4096L, (n + 47) / 48).toInt
    require(chunkElems.toLong * 8 <= Int.MaxValue,
      s"chunkElems $chunkElems overflows the chunk buffer")
    val nChunks = (n + chunkElems - 1) / math.max(chunkElems, 1)
    require(nChunks <= 64,
      s"$nChunks chunks exceed the single-leaf B-tree bound (64); raise chunkElems")

    // --- stream rows once; per column, deflate full chunks as they close
    final class ChunkAcc(t: H5Type, fieldIdx: Int) {
      val chunks = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      private val buf = ByteBuffer.allocate(chunkElems * t.size)
        .order(ByteOrder.LITTLE_ENDIAN)
      private def close(): Unit = if (buf.position() > 0) {
        // edge chunk: pad with fill to the full chunk size (HDF5 stores
        // whole chunks; readers clip via the dataspace dims)
        while (buf.remaining() >= t.size) put(null)
        val d = new java.util.zip.Deflater(deflateLevel)
        d.setInput(buf.array(), 0, buf.position()); d.finish()
        val out = new java.io.ByteArrayOutputStream(buf.position() / 2 + 64)
        val tmp = new Array[Byte](65536)
        while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
        d.end()
        chunks += out.toByteArray
        buf.clear()
      }
      private def put(row: org.apache.spark.sql.Row): Unit = {
        val isNull = row == null || row.isNullAt(fieldIdx)
        t match {
          case F64 => buf.putDouble(if (isNull) Double.NaN else (row.get(fieldIdx) match {
            case f: Float => f.toDouble
            case d: Double => d
            case x: Number => x.doubleValue()
          }))
          case I32 => buf.putInt(if (isNull) Int.MinValue else
            row.get(fieldIdx).asInstanceOf[Number].intValue())
          case I64 => buf.putLong(if (isNull) Long.MinValue else row.getLong(fieldIdx))
        }
      }
      def add(row: org.apache.spark.sql.Row): Unit = {
        put(row)
        if (buf.remaining() < t.size) close()
      }
      def finish(): Unit = close()
    }
    val accs = types.zipWithIndex.map { case ((_, t), i) => new ChunkAcc(t, i) }
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      var i = 0
      while (i < accs.length) { accs(i).add(row); i += 1 }
    }
    accs.foreach(_.finish())

    val c = new Container(types, attrs, varAttrs, n)

    def pipelineBody(): Array[Byte] = {
      val b = new Buf
      b.u8(1).u8(1) // version 1, one filter
      b.u16(0).u32(0) // reserved
      b.u16(1).u16(0) // deflate, name length 0
      b.u16(0).u16(1) // flags (mandatory), 1 client value
      b.u32(deflateLevel.toLong)
      b.u32(0) // pad client data to even count
      b.result()
    }
    def hdr(nm: String, t: H5Type, btreeAddr: Long, refAddrs: Seq[Long]): Array[Byte] =
      c.dsHeader(nm, t, Seq(
        Msg(0x000b, pipelineBody()),
        Msg(0x0008, { val b = new Buf
          b.u8(3).u8(2) // version 3, chunked
          b.u8(2) // dimensionality rank+1
          b.u64(btreeAddr)
          b.u32(chunkElems.toLong).u32(t.size.toLong)
          b.result() })),
        c.dimAttrsFor(nm, refAddrs))
    // chunk B-tree (node type 1, level 0, single leaf): entries used keys
    // interleaved with child pointers, one trailing upper-bound key
    def chunkTree(chunks: Seq[Array[Byte]], addrs: Seq[Long], t: H5Type): Array[Byte] = {
      val b = new Buf
      b.bytes("TREE".getBytes("US-ASCII"))
      b.u8(1).u8(0) // node type 1 (raw data chunk), level 0
      b.u16(chunks.length)
      b.u64(Undef).u64(Undef)
      for (i <- chunks.indices) {
        b.u32(chunks(i).length.toLong).u32(0) // size, filter mask
        b.u64(i.toLong * chunkElems).u64(0) // offsets (elem, byte-within)
        b.u64(addrs(i))
      }
      b.u32(0).u32(0).u64(n).u64(t.size.toLong) // upper-bound key
      b.result()
    }

    // --- address assignment ------------------------------------------------
    val dsHdrSizes = types.map { case (nm, t) =>
      nm -> hdr(nm, t, 0L, c.dataVars.map(_ => 0L)).length
    }.toMap
    val dsHdrAddr = types.map { case (nm, _) =>
      val a = c.at; c.at += dsHdrSizes(nm); nm -> a
    }.toMap
    val dsTreeAddr = types.zipWithIndex.map { case ((nm, _), i) =>
      val a = c.at
      c.at += 24 + (accs(i).chunks.length + 1) * 24 + accs(i).chunks.length * 8
      nm -> a
    }.toMap
    val chunkAddrs = types.zipWithIndex.map { case ((nm, _), i) =>
      nm -> accs(i).chunks.map { ch => val a = c.at; c.at += ch.length; a }.toSeq
    }.toMap
    val eof = c.at

    val raf = new RandomAccessFile(path, "rw")
    try {
      c.writeCommon(raf, eof, dsHdrAddr)
      for (((nm, t), i) <- types.zipWithIndex) {
        val h = hdr(nm, t, dsTreeAddr(nm), c.dataVars.map(dsHdrAddr))
        require(h.length == dsHdrSizes(nm), s"$nm header drifted")
        raf.seek(dsHdrAddr(nm)); raf.write(h)
        raf.seek(dsTreeAddr(nm))
        raf.write(chunkTree(accs(i).chunks.toSeq, chunkAddrs(nm), t))
        for ((c, a) <- accs(i).chunks.zip(chunkAddrs(nm))) {
          raf.seek(a); raf.write(c)
        }
      }
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

  /** One entry in a dataset's filter pipeline (id 1 = deflate, 2 =
    * shuffle, 3 = fletcher32), with its client data values. */
  final case class H5Filter(id: Int, clientData: Seq[Long])

  /** One raw chunk of a chunked-layout dataset: logical element offsets
    * (per dimension, excluding the trailing element-size "dimension"),
    * on-disk address/size and the per-chunk filter exclusion mask. */
  final case class H5Chunk(offsets: Seq[Long], addr: Long, size: Long,
                           filterMask: Long)

  final case class H5Dataset(name: String, dtype: String, n: Long,
                             dataAddr: Long, attrs: Map[String, String],
                             dims: Seq[Long] = Nil,
                             chunkDims: Seq[Long] = Nil,
                             chunks: Seq[H5Chunk] = Nil,
                             filters: Seq[H5Filter] = Nil,
                             fill: Option[Double] = None)
  final case class H5File(attrs: Map[String, String], datasets: Seq[H5Dataset])

  private final class Rd(val b: Array[Byte]) {
    def u8(at: Int): Int = b(at) & 0xff
    def u16(at: Int): Int = u8(at) | (u8(at + 1) << 8)
    def u32(at: Int): Long = (0 until 4).map(i => u8(at + i).toLong << (8 * i)).sum
    def u64(at: Int): Long = (0 until 8).map(i => u8(at + i).toLong << (8 * i)).sum
    def uN(at: Int, n: Int): Long = (0 until n).map(i => u8(at + i).toLong << (8 * i)).sum
    def ascii(at: Int, n: Int) = new String(b, at, n, "US-ASCII")
    def cstr(at: Int): String = {
      // untrusted input: a missing NUL must throw cleanly, not scan OOB
      var e = at
      while (e < b.length && b(e) != 0) e += 1
      require(e < b.length, s"unterminated string at $at")
      ascii(at, e - at)
    }
  }

  /** Open an HDF5 file: this writer's own earliest-libver subset AND the
    * structures netCDF-4/h5netcdf actually emit (superblock v0, v1 object
    * headers WITH continuation blocks, v2 "OHDR" headers with compact Link
    * messages and OCHK continuations, v1/v2/v3 attributes over
    * string/integer/float/vlen-string datatypes with GCOL lookup,
    * contiguous/compact/chunked v3 layouts, v1 chunk B-trees, and
    * deflate/shuffle/fletcher32 filter pipelines). Nested groups flatten
    * with a `group/` name prefix. Structures beyond this (fractal-heap
    * dense links, v4 layouts, superblock v2+) throw with a clear message
    * rather than misparse. Reference default engine:
    * stglib/rsk/cdf2nc.py:145-147 (xarray NETCDF4), re-opened everywhere
    * via xr.load_dataset (stglib/core/utils.py:862-877). */
  def open(bytes: Array[Byte]): H5File = {
    val r = new Rd(bytes)
    require(r.ascii(1, 3) == "HDF" && r.u8(0) == 0x89, "not an HDF5 file")
    require(r.u8(8) == 0, s"superblock version ${r.u8(8)} unsupported")
    require(r.u8(13) == 8 && r.u8(14) == 8, "expected 8-byte offsets/lengths")
    val rootOH = r.u64(56 + 8)

    // -- object headers: v1 (version byte 1) or v2 ("OHDR") --------------
    // returns (type, bodyOffset, size) across all continuation blocks
    def parseHeader(at0: Long): Seq[(Int, Int, Int)] = {
      val at = at0.toInt
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
      if (r.ascii(at, 4) == "OHDR") {
        val flags = r.u8(at + 5)
        var o = at + 6
        if ((flags & 0x20) != 0) o += 16 // access/mod/change/birth times
        if ((flags & 0x10) != 0) o += 4  // max-compact / min-dense
        val szb = 1 << (flags & 0x3)
        val size = r.uN(o, szb); o += szb
        val blocks = scala.collection.mutable.Queue[(Int, Int)]((o, o + size.toInt))
        // untrusted input: a crafted OCHK cycle must throw, not loop —
        // track visited block starts and bound the block count
        val seen = scala.collection.mutable.Set[Int]()
        while (blocks.nonEmpty) {
          val (s0, e0) = blocks.dequeue()
          require(seen.add(s0), "continuation-block cycle")
          require(seen.size <= 1024, "too many continuation blocks")
          var p = s0
          while (p + 4 <= e0) {
            val typ = r.u8(p); val sz = r.u16(p + 1); p += 4
            if ((flags & 0x04) != 0) p += 2 // creation order
            if (typ == 0x10) {
              val caddr = r.u64(p).toInt; val clen = r.u64(p + 8).toInt
              require(r.ascii(caddr, 4) == "OCHK", "continuation signature")
              blocks.enqueue((caddr + 4, caddr + clen - 4)) // strip sig+checksum
            } else out += ((typ, p, sz))
            p += sz
          }
        }
      } else {
        require(r.u8(at) == 1, s"object header version at $at0")
        val nMsgs = r.u16(at + 2)
        var remaining = nMsgs
        val blocks = scala.collection.mutable.Queue[(Int, Int)](
          (at + 16, at + 16 + r.u32(at + 8).toInt))
        val seen = scala.collection.mutable.Set[Int]()
        while (remaining > 0 && blocks.nonEmpty) {
          val (s0, e0) = blocks.dequeue()
          require(seen.add(s0), "continuation-block cycle")
          var o = s0
          while (remaining > 0 && o + 8 <= e0) {
            val typ = r.u16(o); val sz = r.u16(o + 2)
            if (typ == 0x0010) {
              // v1 continuation blocks are raw message runs (no signature)
              val caddr = r.u64(o + 8).toInt; val clen = r.u64(o + 16).toInt
              blocks.enqueue((caddr, caddr + clen))
            } else out += ((typ, o + 8, sz))
            o += 8 + sz
            remaining -= 1
          }
        }
      }
      out.toSeq.filterNot(_._1 == 0x0010)
    }

    // -- global heap (vlen string attribute values) -----------------------
    def gcolString(addr: Long, index: Int, size: Int): String = {
      val a = addr.toInt
      require(r.ascii(a, 4) == "GCOL", "global heap signature")
      var o = a + 16
      val end = a + r.u64(a + 8).toInt
      while (o < end) {
        val idx = r.u16(o); val sz = r.u64(o + 8).toInt
        if (idx == index) return r.ascii(o + 16, size)
        if (idx == 0) return "" // free space marker: not found
        o += 16 + ((sz + 7) / 8) * 8
      }
      ""
    }

    // -- attribute decode (v1 padded / v2 / v3 unpadded) ------------------
    def parseAttr(at: Int): (String, String) = {
      val ver = r.u8(at)
      require(ver >= 1 && ver <= 3, s"attribute message version $ver")
      val nameSz = r.u16(at + 2); val dtSz = r.u16(at + 4); val dsSz = r.u16(at + 6)
      def pad8(x: Int) = x + (8 - x % 8) % 8
      val nameAt = at + (if (ver == 3) 9 else 8) // v3: +1 name-encoding byte
      val name = r.cstr(nameAt)
      val (dtAt, dsAt) =
        if (ver == 1) (nameAt + pad8(nameSz), nameAt + pad8(nameSz) + pad8(dtSz))
        else (nameAt + nameSz, nameAt + nameSz + dtSz)
      val dataAt = if (ver == 1) dsAt + pad8(dsSz) else dsAt + dsSz
      // element count from the attribute's dataspace (rank 0 -> 1)
      val dsVer = r.u8(dsAt); val rank = r.u8(dsAt + 1)
      val dimsAt = if (dsVer == 2) dsAt + 4 else dsAt + 8
      val count = (0 until rank).map(i => r.u64(dimsAt + 8 * i)).product max 1L
      // untrusted input: attribute values are small metadata — a crafted
      // dataspace with a huge element count must throw, not spin decoding
      require(count <= (1L << 20), s"implausible attribute element count $count")
      val cls = r.u8(dtAt) & 0x0f
      val tSz = r.u32(dtAt + 4).toInt
      val value = cls match {
        case 3 => r.ascii(dataAt, tSz).takeWhile(_ != 0.toChar)
        case 0 =>
          val signed = (r.u8(dtAt + 1) & 0x08) != 0
          (0L until count).map { i =>
            val raw = r.uN(dataAt + i.toInt * tSz, tSz)
            val v = if (signed && tSz < 8) {
              val shift = 64 - 8 * tSz; (raw << shift) >> shift
            } else raw
            v.toString
          }.mkString(", ")
        case 1 =>
          (0L until count).map { i =>
            val v = if (tSz == 4)
              java.lang.Float.intBitsToFloat(r.u32(dataAt + i.toInt * 4).toInt).toDouble
            else java.lang.Double.longBitsToDouble(r.u64(dataAt + i.toInt * 8))
            if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString else v.toString
          }.mkString(", ")
        case 9 if (r.u8(dtAt + 1) & 0x0f) == 1 =>
          // vlen string: each element (size u32, gcol addr u64, gcol idx u32)
          (0L until count).map { i =>
            val e = dataAt + i.toInt * 16
            gcolString(r.u64(e + 4), r.u32(e + 12).toInt, r.u32(e).toInt)
          }.mkString(", ")
        case other => s"<datatype class $other>"
      }
      (name, value)
    }

    // -- v1 chunk B-tree walk (node type 1) -------------------------------
    def walkChunkTree(addr: Long, nDims: Int, depth: Int): Seq[H5Chunk] = {
      if (addr == Undef || addr == -1L) return Nil
      // untrusted input: a crafted tree with address cycles must throw,
      // not recurse forever (real chunk trees are a few levels deep)
      require(depth < 32, "chunk B-tree too deep")
      val a = addr.toInt
      require(r.ascii(a, 4) == "TREE", "chunk B-tree signature")
      require(r.u8(a + 4) == 1, "B-tree node type != chunked-data")
      val level = r.u8(a + 5); val used = r.u16(a + 6)
      val keySz = 8 + 8 * nDims // size u32 + mask u32 + offsets u64*ndims
      var o = a + 24
      val out = scala.collection.mutable.ArrayBuffer[H5Chunk]()
      for (_ <- 0 until used) {
        val size = r.u32(o); val mask = r.u32(o + 4)
        val offs = (0 until nDims).map(i => r.u64(o + 8 + 8 * i))
        val child = r.u64(o + keySz)
        if (level == 0)
          out += H5Chunk(offs.dropRight(1), child, size, mask)
        else out ++= walkChunkTree(child, nDims, depth + 1)
        o += keySz + 8
      }
      out.toSeq
    }

    // -- links out of a group header --------------------------------------
    def groupLinks(msgs: Seq[(Int, Int, Int)]): Seq[(String, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      // old-style: symbol table -> TREE (any depth) -> SNOD leaves
      msgs.find(_._1 == 0x0011).foreach { case (_, o, _) =>
        val btreeAddr = r.u64(o); val heapHdrAddr = r.u64(o + 8)
        val heapSegAddr = r.u64(heapHdrAddr.toInt + 24)
        def walkGroupTree(at: Long, depth: Int): Seq[Long] = {
          require(depth < 32, "group B-tree too deep")
          val a = at.toInt
          require(r.ascii(a, 4) == "TREE", "group B-tree signature")
          val level = r.u8(a + 5); val used = r.u16(a + 6)
          val children = (0 until used).map(i => r.u64(a + 24 + 8 + i * 16))
          if (level == 0) children
          else children.flatMap(c => walkGroupTree(c, depth + 1))
        }
        for (sa <- walkGroupTree(btreeAddr, 0)) {
          require(r.ascii(sa.toInt, 4) == "SNOD", "symbol node signature")
          val nSyms = r.u16(sa.toInt + 6)
          for (i <- 0 until nSyms) {
            val e = sa.toInt + 8 + i * 40
            out += ((r.cstr((heapSegAddr + r.u64(e)).toInt), r.u64(e + 8)))
          }
        }
      }
      // new-style compact links (netCDF-4's shape when few links): Link
      // messages in the header; dense (fractal heap) storage unsupported
      msgs.find(_._1 == 0x0002).foreach { case (_, o, _) =>
        val fl = r.u8(o + 1)
        var p = o + 2
        if ((fl & 0x01) != 0) p += 8 // max creation index
        val fheap = r.u64(p)
        require(fheap == Undef,
          "dense (fractal-heap) group links unsupported; write with libver='earliest'")
      }
      for ((typ, o, _) <- msgs if typ == 0x0006) {
        require(r.u8(o) == 1, "link message version")
        val fl = r.u8(o + 1)
        var p = o + 2
        val hasType = (fl & 0x08) != 0
        val linkType = if (hasType) r.u8(p) else 0
        if (hasType) p += 1
        if ((fl & 0x04) != 0) p += 8 // creation order
        if ((fl & 0x10) != 0) p += 1 // charset
        val lszB = 1 << (fl & 0x3)
        val lsz = r.uN(p, lszB).toInt; p += lszB
        val nm = r.ascii(p, lsz); p += lsz
        if (linkType == 0) out += ((nm, r.u64(p))) // hard links only
      }
      out.toSeq
    }

    def isGroup(msgs: Seq[(Int, Int, Int)]): Boolean =
      msgs.exists(m => m._1 == 0x0011 || m._1 == 0x0002 || m._1 == 0x0006 ||
        m._1 == 0x000a) && !msgs.exists(_._1 == 0x0008)

    def parseDataset(name: String, msgs: Seq[(Int, Int, Int)]): H5Dataset = {
      var n = -1L; var dataAddr = -1L; var dtype = "unknown"
      var dims: Seq[Long] = Nil; var chunkDims: Seq[Long] = Nil
      var chunks: Seq[H5Chunk] = Nil; var filters: Seq[H5Filter] = Nil
      var fillAt = -1; var fillSz = 0
      val attrs = scala.collection.mutable.Map[String, String]()
      for ((typ, o, sz) <- msgs) typ match {
        case 0x0005 =>
          // fill value message: v1 always carries size+data; v2 only when
          // `defined`; v3 only when flags bit 5. Datatype may parse after
          // this message, so record the span and decode below.
          val ver = r.u8(o)
          if (ver <= 2) {
            val defined = r.u8(o + 3)
            if (ver == 1 || defined == 1) {
              val s = r.u32(o + 4).toInt
              if (s > 0) { fillAt = o + 8; fillSz = s }
            }
          } else {
            val flags = r.u8(o + 1)
            if ((flags & 0x20) != 0) {
              val s = r.u32(o + 2).toInt
              if (s > 0) { fillAt = o + 6; fillSz = s }
            }
          }
        case 0x0001 =>
          val ver = r.u8(o); val rank = r.u8(o + 1)
          val dimsAt = if (ver == 2) o + 4 else o + 8
          dims = (0 until rank).map(i => r.u64(dimsAt + 8 * i))
          n = if (dims.isEmpty) 1L else dims.product
        case 0x0003 =>
          val cls = r.u8(o) & 0x0f
          val tSz = r.u32(o + 4).toInt
          val signed = (r.u8(o + 1) & 0x08) != 0
          dtype = (cls, tSz) match {
            case (0, 1) => if (signed) "i8" else "u8"
            case (0, 2) => if (signed) "i16" else "u16"
            case (0, 4) => if (signed) "i32" else "u32"
            case (0, 8) => "i64"
            case (1, 4) => "f32"
            case (1, 8) => "f64"
            case (3, w) => s"s$w"
            case other => s"class$other"
          }
        case 0x0008 =>
          val ver = r.u8(o)
          require(ver == 3, s"data layout version $ver unsupported")
          r.u8(o + 1) match {
            case 0 => // compact: size u16, data inline
              dataAddr = o + 4L
            case 1 =>
              dataAddr = r.u64(o + 2)
            case 2 =>
              val nd = r.u8(o + 2)
              val baddr = r.u64(o + 3)
              chunkDims = (0 until nd - 1).map(i => r.u32(o + 11 + 4 * i))
              chunks = walkChunkTree(baddr, nd, 0)
            case cls => throw new IllegalArgumentException(s"layout class $cls")
          }
        case 0x000b =>
          val ver = r.u8(o); val nf = r.u8(o + 1)
          var p = if (ver == 1) o + 8 else o + 2
          filters = (0 until nf).map { _ =>
            val id = r.u16(p)
            val nameLen =
              if (ver == 1 || id >= 256) { val v = r.u16(p + 2); p += 2; v } else 0
            val flags = r.u16(p + 2); val nclient = r.u16(p + 4)
            p += 6
            if (nameLen > 0) p += (if (ver == 1) ((nameLen + 7) / 8) * 8 else nameLen)
            val client = (0 until nclient).map(i => r.u32(p + 4 * i))
            p += 4 * nclient
            if (ver == 1 && nclient % 2 == 1) p += 4
            H5Filter(id, client)
          }
        case 0x000c =>
          val (k, v) = parseAttr(o); attrs(k) = v
        case _ => ()
      }
      // the header fill-value message wins; a numeric _FillValue attr is
      // the fallback (netCDF-4 writes both; older tools only the attr)
      val fill: Option[Double] =
        (if (fillAt >= 0 && dtype != "unknown" && fillSz == elemSize(dtype))
           Some(decodeOne(ByteBuffer.wrap(r.b, fillAt, fillSz)
             .order(ByteOrder.LITTLE_ENDIAN), dtype))
         else None)
          .orElse(attrs.get("_FillValue")
            .flatMap(_.split("\\s+").headOption)
            .flatMap(s => try Some(s.toDouble)
                          catch { case _: NumberFormatException => None }))
      H5Dataset(name, dtype, n, dataAddr, attrs.toMap, dims, chunkDims,
        chunks, filters, fill)
    }

    val rootMsgs = parseHeader(rootOH)
    val rootAttrs = rootMsgs.collect { case (0x000c, o, _) => parseAttr(o) }.toMap
    val datasets = scala.collection.mutable.ArrayBuffer[H5Dataset]()
    def walk(prefix: String, msgs: Seq[(Int, Int, Int)], depth: Int): Unit = {
      require(depth < 32, "group nesting too deep")
      for ((nm, addr) <- groupLinks(msgs)) {
        val child = parseHeader(addr)
        if (isGroup(child)) walk(prefix + nm + "/", child, depth + 1)
        else datasets += parseDataset(prefix + nm, child)
      }
    }
    walk("", rootMsgs, 0)
    H5File(rootAttrs, datasets.toSeq)
  }

  private def elemSize(dtype: String): Int = dtype match {
    case "i8" | "u8" => 1
    case "i16" | "u16" => 2
    case "i32" | "u32" | "f32" => 4
    case "i64" | "f64" => 8
    case s if s.startsWith("s") => s.drop(1).toInt
    case other => throw new IllegalArgumentException(s"dtype $other")
  }

  private def decodeOne(bb: ByteBuffer, dtype: String): Double = dtype match {
    case "f64" => bb.getDouble()
    case "f32" => bb.getFloat().toDouble
    case "i64" => bb.getLong().toDouble
    case "i32" => bb.getInt().toDouble
    case "u32" => (bb.getInt().toLong & 0xffffffffL).toDouble
    case "i16" => bb.getShort().toDouble
    case "u16" => (bb.getShort() & 0xffff).toDouble
    case "i8" => bb.get().toDouble
    case "u8" => (bb.get() & 0xff).toDouble
    case other => throw new IllegalArgumentException(s"dtype $other")
  }

  /** Undo a chunk's filter pipeline (applied in reverse write order):
    * fletcher32 strips its trailing checksum, shuffle de-interleaves the
    * byte planes, deflate inflates. */
  private def defilter(raw: Array[Byte], filters: Seq[H5Filter],
                       mask: Long, esz: Int): Array[Byte] = {
    var data = raw
    for (((f, i)) <- filters.zipWithIndex.reverse) {
      if ((mask & (1L << i)) == 0) f.id match {
        case 1 =>
          val inf = new java.util.zip.Inflater()
          inf.setInput(data)
          val out = new java.io.ByteArrayOutputStream(data.length * 4)
          val buf = new Array[Byte](65536)
          while (!inf.finished()) {
            val k = inf.inflate(buf)
            if (k == 0 && inf.needsInput()) throw new IllegalArgumentException(
              "truncated deflate chunk")
            out.write(buf, 0, k)
          }
          inf.end()
          data = out.toByteArray
        case 2 =>
          val sz = f.clientData.headOption.map(_.toInt).getOrElse(esz)
          val n = data.length / sz
          val out = new Array[Byte](data.length)
          var j = 0
          while (j < sz) {
            var i2 = 0
            while (i2 < n) { out(i2 * sz + j) = data(j * n + i2); i2 += 1 }
            j += 1
          }
          // trailing bytes (length not divisible by element size) copy as-is
          System.arraycopy(data, n * sz, out, n * sz, data.length - n * sz)
          data = out
        case 3 =>
          data = java.util.Arrays.copyOf(data, data.length - 4)
        case other => throw new IllegalArgumentException(
          s"filter $other unsupported (deflate/shuffle/fletcher32 only)")
      }
    }
    data
  }

  /** Decode a dataset (contiguous, compact, or chunked+filtered) as a
    * row-major double array of all `n` elements. */
  def column(bytes: Array[Byte], ds: H5Dataset): Array[Double] = {
    val esz = elemSize(ds.dtype)
    if (ds.chunks.isEmpty) {
      require(ds.dataAddr >= 0, s"${ds.name}: no data address")
      val bb = ByteBuffer.wrap(bytes, ds.dataAddr.toInt, (ds.n * esz).toInt)
        .order(ByteOrder.LITTLE_ENDIAN)
      Array.fill(ds.n.toInt)(decodeOne(bb, ds.dtype))
    } else {
      val dims = if (ds.dims.nonEmpty) ds.dims else Seq(ds.n)
      // unallocated chunks read as the dataset's fill value (the HDF5
      // library contract) — zero only when no fill is declared anywhere
      val out = Array.fill(ds.n.toInt)(ds.fill.getOrElse(0.0))
      // row-major strides of the logical array
      val strides = dims.scanRight(1L)(_ * _).drop(1)
      for (c <- ds.chunks) {
        val raw = java.util.Arrays.copyOfRange(bytes, c.addr.toInt,
          (c.addr + c.size).toInt)
        val data = defilter(raw, ds.filters, c.filterMask, esz)
        val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
        val cd = if (ds.chunkDims.nonEmpty) ds.chunkDims else Seq(ds.n)
        val total = cd.product
        var i = 0L
        while (i < total) {
          // position of element i inside the chunk grid, then global
          var rem = i; var pos = 0L; var inRange = true
          var d = 0
          while (d < cd.length) {
            val sub = cd.drop(d + 1).product
            val coord = c.offsets(d) + rem / sub
            rem = rem % sub
            if (coord >= dims(d)) inRange = false
            pos += coord * strides(d)
            d += 1
          }
          val v = decodeOne(bb, ds.dtype)
          if (inRange) out(pos.toInt) = v
          i += 1
        }
      }
      out
    }
  }
}
