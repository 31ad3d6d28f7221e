package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Shared test scaffolding: synthesizes MAT-File Level 5 bytes per the
  * public spec (numeric/char matrices, structs, zlib wrapping). */
object Mat5Fixture {

  def le(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()

  def element(dtype: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(le(dtype)); out.write(le(payload.length)); out.write(payload)
    val pad = (8 - (payload.length % 8)) % 8
    out.write(new Array[Byte](pad))
    out.toByteArray
  }

  def doubles(xs: Double*): Array[Byte] = {
    val b = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putDouble)
    b.array()
  }

  /** Column-major numeric matrix (pass xs in MATLAB storage order). */
  def matrixNum(name: String, rows: Int, cols: Int, xs: Double*): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    body.write(element(6, Array[Byte](6, 0, 0, 0, 0, 0, 0, 0))) // flags: mxDOUBLE
    body.write(element(5, le(rows) ++ le(cols)))                 // dims
    body.write(element(1, name.getBytes("US-ASCII")))            // name (miINT8)
    body.write(element(9, doubles(xs: _*)))                      // real data
    element(14, body.toByteArray)                                // miMATRIX
  }

  /** Char matrix (UTF-8 payload). */
  def matrixChars(name: String, s: String): Array[Byte] = {
    val bytes = s.getBytes("UTF-8")
    val body = new ByteArrayOutputStream()
    body.write(element(6, Array[Byte](4, 0, 0, 0, 0, 0, 0, 0))) // flags: mxCHAR
    body.write(element(5, le(1) ++ le(s.length)))
    body.write(element(1, name.getBytes("US-ASCII")))
    body.write(element(16, bytes))                               // miUTF8
    element(14, body.toByteArray)
  }

  /** 3-D numeric array (column-major xs). */
  def matrixNum3(name: String, d1: Int, d2: Int, d3: Int, xs: Double*): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    body.write(element(6, Array[Byte](6, 0, 0, 0, 0, 0, 0, 0)))
    body.write(element(5, le(d1) ++ le(d2) ++ le(d3)))
    body.write(element(1, name.getBytes("US-ASCII")))
    body.write(element(9, doubles(xs: _*)))
    element(14, body.toByteArray)
  }

  /** Cell array of the given element matrices. */
  def matrixCell(name: String, items: Seq[Array[Byte]]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    body.write(element(6, Array[Byte](1, 0, 0, 0, 0, 0, 0, 0))) // flags: mxCELL
    body.write(element(5, le(items.length) ++ le(1)))
    body.write(element(1, name.getBytes("US-ASCII")))
    items.foreach(body.write)
    element(14, body.toByteArray)
  }

  def matrixStruct(name: String, fields: Seq[(String, Array[Byte])]): Array[Byte] = {
    val fieldNameLen = 32
    val body = new ByteArrayOutputStream()
    body.write(element(6, Array[Byte](2, 0, 0, 0, 0, 0, 0, 0))) // flags: mxSTRUCT
    body.write(element(5, le(1) ++ le(1)))
    body.write(element(1, name.getBytes("US-ASCII")))
    body.write(element(5, le(fieldNameLen)))                     // field name length
    val fn = new ByteArrayOutputStream()
    fields.foreach { case (f, _) =>
      fn.write(f.getBytes("US-ASCII").padTo(fieldNameLen, ' '.toByte))
    }
    body.write(element(1, fn.toByteArray))
    fields.foreach { case (_, m) => body.write(m) }              // field matrices
    element(14, body.toByteArray)
  }

  def matFile(elems: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val text = "MATLAB 5.0 MAT-file, graft test".getBytes("US-ASCII").padTo(116, ' '.toByte)
    out.write(text)
    out.write(new Array[Byte](8))           // subsys offset
    out.write(Array[Byte](0x00, 0x01))      // version 0x0100 (LE)
    out.write('I'); out.write('M')          // endian indicator
    elems.foreach(out.write)
    out.toByteArray
  }
}
