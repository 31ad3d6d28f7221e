package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Synthesizes MAT-File Level 5 bytes per the public spec and round-trips
  * the parser: numeric arrays, char arrays, structs, and the zlib-compressed
  * wrapping that real Nortek/SonTek exports use. */
class Mat5Spec extends AnyFunSuite {

  private def le(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()

  private def element(dtype: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(le(dtype)); out.write(le(payload.length)); out.write(payload)
    val pad = (8 - (payload.length % 8)) % 8
    out.write(new Array[Byte](pad))
    out.toByteArray
  }

  private def doubles(xs: Double*): Array[Byte] = {
    val b = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putDouble)
    b.array()
  }

  private def matrixNum(name: String, rows: Int, cols: Int, xs: Double*): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    body.write(element(6, Array[Byte](6, 0, 0, 0, 0, 0, 0, 0))) // flags: mxDOUBLE
    body.write(element(5, le(rows) ++ le(cols)))                 // dims
    body.write(element(1, name.getBytes("US-ASCII")))            // name (miINT8)
    body.write(element(9, doubles(xs: _*)))                      // real data
    element(14, body.toByteArray)                                // miMATRIX
  }

  private def matrixStruct(name: String, fields: Seq[(String, Array[Byte])]): Array[Byte] = {
    val fieldNameLen = 32
    val body = new ByteArrayOutputStream()
    body.write(element(6, Array[Byte](2, 0, 0, 0, 0, 0, 0, 0))) // flags: mxSTRUCT
    body.write(element(5, le(1) ++ le(1)))
    body.write(element(1, name.getBytes("US-ASCII")))
    body.write(element(5, le(fieldNameLen)))                     // field name length
    val fn = new ByteArrayOutputStream()
    fields.foreach { case (f, _) =>
      val padded = f.getBytes("US-ASCII").padTo(fieldNameLen, ' '.toByte)
      fn.write(padded)
    }
    body.write(element(1, fn.toByteArray))
    fields.foreach { case (_, m) => body.write(m) }              // field matrices
    element(14, body.toByteArray)
  }

  private def matFile(elems: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val text = "MATLAB 5.0 MAT-file, graft test".getBytes("US-ASCII").padTo(116, ' '.toByte)
    out.write(text)
    out.write(new Array[Byte](8))           // subsys offset
    out.write(Array[Byte](0x00, 0x01))      // version 0x0100 (LE)
    out.write('I'); out.write('M')          // endian indicator
    elems.foreach(out.write)
    out.toByteArray
  }

  test("numeric + struct round trip") {
    val burst = matrixStruct("Burst", Seq(
      "Pressure" -> matrixNum("", 3, 1, 10.1, 10.2, 10.3),
      "VelEast" -> matrixNum("", 3, 1, 0.5, -0.2, 0.1)))
    val cfg = matrixNum("SampleRate", 1, 1, 8.0)
    val m = Mat5.parse(matFile(burst, cfg))
    assert(m.keySet == Set("Burst", "SampleRate"))
    val s = m("Burst").asInstanceOf[Mat5.MatStruct]
    assert(s.fields.keySet == Set("Pressure", "VelEast"))
    val p = s.fields("Pressure").asInstanceOf[Mat5.MatNum]
    assert(p.dims.toSeq == Seq(3, 1))
    assert(p.data.toSeq == Seq(10.1, 10.2, 10.3))
    val sr = m("SampleRate").asInstanceOf[Mat5.MatNum]
    assert(sr.data.toSeq == Seq(8.0))
  }

  test("miCOMPRESSED (zlib) wrapping, as written by real exporters") {
    val inner = matrixNum("Temperature", 2, 1, 21.5, 21.6)
    val defl = new java.util.zip.Deflater()
    defl.setInput(inner); defl.finish()
    val buf = new Array[Byte](inner.length * 2 + 64)
    val n = defl.deflate(buf)
    val compressed = element(15, buf.take(n))
    val m = Mat5.parse(matFile(compressed))
    val t = m("Temperature").asInstanceOf[Mat5.MatNum]
    assert(t.data.toSeq == Seq(21.5, 21.6))
  }

  test("int16 data promotes to double (instrument counts)") {
    val body = new ByteArrayOutputStream()
    body.write(element(6, Array[Byte](10, 0, 0, 0, 0, 0, 0, 0))) // mxINT16
    body.write(element(5, le(2) ++ le(1)))
    body.write(element(1, "Counts".getBytes("US-ASCII")))
    val d = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(1234.toShort).putShort((-32768).toShort).array()
    body.write(element(3, d)) // miINT16
    val m = Mat5.parse(matFile(element(14, body.toByteArray)))
    val c = m("Counts").asInstanceOf[Mat5.MatNum]
    assert(c.data.toSeq == Seq(1234.0, -32768.0))
  }
}
