package graft.io

import java.io.ByteArrayOutputStream

/** Test scaffolding: assembles a minimal HDF5 file (v0 superblock, v1
  * object headers, one TREE/SNOD/HEAP group, contiguous datasets of any
  * rank) directly from the public file-format spec — independently of
  * the production writer, so reader tests for shapes the writer does
  * not emit (rank-2 profile variables) have a byte-level fixture. */
object Hdf5Fixture {

  private class B {
    val o = new ByteArrayOutputStream()
    def u8(v: Int): B = { o.write(v & 0xff); this }
    def u16(v: Int): B = { u8(v); u8(v >> 8) }
    def u32(v: Long): B = { (0 until 4).foreach(i => u8(((v >> (8 * i)) & 0xff).toInt)); this }
    def u64(v: Long): B = { (0 until 8).foreach(i => u8(((v >> (8 * i)) & 0xff).toInt)); this }
    def bytes(b: Array[Byte]): B = { o.write(b); this }
    def ascii(s: String): B = { o.write(s.getBytes("US-ASCII")); this }
    def pad(to: Int): B = { while (o.size % to != 0) u8(0); this }
    def size: Int = o.size
    def result: Array[Byte] = o.toByteArray
  }

  final case class Var(name: String, dims: Seq[Long], data: Array[Double],
                       attrs: Seq[(String, String)] = Nil,
                       fill: Option[Double] = None)

  /** v2 fill-value message with a DEFINED f64 value (the shape the
    * production writer never emits — this is precisely what the fixture
    * exists to cover). */
  private def fillMsg(v: Double): Array[Byte] = {
    val b = new B
    b.u8(2).u8(1).u8(2).u8(1) // version 2, alloc, fill time, defined = 1
    b.u32(8)
    b.u64(java.lang.Double.doubleToLongBits(v))
    b.result
  }

  private def msg(typ: Int, body: Array[Byte]): Array[Byte] = {
    val padded = body ++ new Array[Byte]((8 - body.length % 8) % 8)
    val b = new B
    b.u16(typ).u16(padded.length).u8(0).u8(0).u8(0).u8(0).bytes(padded)
    b.result
  }

  private def header(msgs: Seq[Array[Byte]]): Array[Byte] = {
    val total = msgs.map(_.length).sum
    val b = new B
    b.u8(1).u8(0).u16(msgs.length).u32(1).u32(total.toLong).u32(0)
    msgs.foreach(b.bytes)
    b.result
  }

  private def f64Type: Array[Byte] = {
    val b = new B
    b.u8(0x11).u8(0x20).u8(0x3f).u8(0).u32(8).u16(0).u16(64)
    b.u8(52).u8(11).u8(0).u8(52).u32(1023)
    b.result
  }

  private def space(dims: Seq[Long]): Array[Byte] = {
    val b = new B
    b.u8(1).u8(dims.length).u8(0).u8(0).u32(0)
    dims.foreach(b.u64)
    b.result
  }

  private def strAttr(name: String, value: String): Array[Byte] = {
    val nb = name.getBytes("US-ASCII") :+ 0.toByte
    val vb = value.getBytes("US-ASCII")
    val dt = { val b = new B; b.u8(0x13).u8(0).u8(0).u8(0).u32(math.max(vb.length, 1).toLong); b.result }
    val ds = { val b = new B; b.u8(1).u8(0).u8(0).u8(0).u32(0); b.result }
    def pad8(a: Array[Byte]) = a ++ new Array[Byte]((8 - a.length % 8) % 8)
    val b = new B
    b.u8(1).u8(0).u16(nb.length).u16(dt.length).u16(ds.length)
    b.bytes(pad8(nb)).bytes(pad8(dt)).bytes(pad8(ds))
    b.bytes(if (vb.isEmpty) Array[Byte](0) else vb)
    b.result
  }

  /** Build the file bytes for a flat group of contiguous f64 datasets. */
  def file(vars: Seq[Var]): Array[Byte] = {
    val Undef = -1L
    // local heap: null slot + names
    val heap = new B; heap.u64(0)
    val nameOff = vars.map { v =>
      val off = heap.size; heap.ascii(v.name).u8(0).pad(8); v.name -> off.toLong
    }.toMap
    val rootHdr0 = header(Seq(msg(0x11, { val b = new B; b.u64(0).u64(0); b.result })))
    val btreeSize = 24 + 9 * 8 + 8 * 8
    val snodSize = 8 + 8 * 40
    var at = 96L
    val rootAddr = at; at += rootHdr0.length
    val btreeAddr = at; at += btreeSize
    val snodAddr = at; at += snodSize
    val heapHdrAddr = at; at += 32
    val heapSegAddr = at; at += heap.size
    def dsHdr(v: Var, dataAddr: Long): Array[Byte] = header(
      Seq(msg(0x01, space(v.dims)), msg(0x03, f64Type),
        msg(0x08, { val b = new B
          b.u8(3).u8(1).u64(dataAddr).u64(v.data.length.toLong * 8); b.result })) ++
      v.fill.map(f => msg(0x05, fillMsg(f))).toSeq ++
      v.attrs.map { case (k, x) => msg(0x0c, strAttr(k, x)) })
    val hdrSizes = vars.map(v => v.name -> dsHdr(v, 0L).length).toMap
    val hdrAddr = vars.map { v => val a = at; at += hdrSizes(v.name); v.name -> a }.toMap
    val dataAddr = vars.map { v => val a = at; at += v.data.length * 8L; v.name -> a }.toMap
    val eof = at

    val out = new B
    out.bytes(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
    out.u8(0).u8(0).u8(0).u8(0).u8(0).u8(8).u8(8).u8(0)
    out.u16(4).u16(16).u32(0)
    out.u64(0).u64(Undef).u64(eof).u64(Undef)
    out.u64(0).u64(rootAddr).u32(1).u32(0).u64(btreeAddr).u64(heapHdrAddr)
    require(out.size == 96)
    out.bytes(header(Seq(msg(0x11, { val b = new B; b.u64(btreeAddr).u64(heapHdrAddr); b.result }))))
    val bt = new B
    bt.ascii("TREE").u8(0).u8(0).u16(1).u64(Undef).u64(Undef)
    bt.u64(0).u64(snodAddr).u64(nameOff(vars.map(_.name).max))
    while (bt.size < btreeSize) bt.u8(0)
    out.bytes(bt.result)
    val sn = new B
    sn.ascii("SNOD").u8(1).u8(0).u16(vars.length)
    for (nm <- vars.map(_.name).sorted) {
      sn.u64(nameOff(nm)).u64(hdrAddr(nm)).u32(0).u32(0).u64(0).u64(0)
    }
    while (sn.size < snodSize) sn.u8(0)
    out.bytes(sn.result)
    val hp = new B
    hp.ascii("HEAP").u8(0).u8(0).u8(0).u8(0).u64(heap.size.toLong).u64(1).u64(heapSegAddr)
    out.bytes(hp.result).bytes(heap.result)
    for (v <- vars) out.bytes(dsHdr(v, dataAddr(v.name)))
    for (v <- vars) {
      val b = java.nio.ByteBuffer.allocate(v.data.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      v.data.foreach(b.putDouble)
      out.bytes(b.array())
    }
    out.result
  }
}
