package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/**
 * MATLAB Level-5 .mat reader (SURVEY §2.1: the SonTek IQ / Nortek Signature /
 * AQUAscat ABS ingest family — stglib reads these via scipy loadmat,
 * stglib/core/utils.py:1612-1647, stglib/sig/mat2cdf.py:22-790,
 * stglib/abss.py:14-255). Implements the public MAT-File Level 5 format:
 * 128-byte header, tagged data elements, miMATRIX with numeric / char /
 * struct classes, miCOMPRESSED (zlib) wrapping, small-element format.
 *
 * Returns a tree of [[MatValue]]s; the Spark layer flattens numeric arrays
 * into long-format rows. Files decode independently (binaryFile source →
 * per-file parse), same distribution model as Pd0.
 */
object Mat5 {

  sealed trait MatValue
  final case class MatNum(dims: Array[Int], data: Array[Double]) extends MatValue
  final case class MatChars(s: String) extends MatValue
  final case class MatStruct(fields: Map[String, MatValue]) extends MatValue
  final case class MatCell(items: Seq[MatValue]) extends MatValue

  // MAT data types
  private val miINT8 = 1; private val miUINT8 = 2
  private val miINT16 = 3; private val miUINT16 = 4
  private val miINT32 = 5; private val miUINT32 = 6
  private val miSINGLE = 7; private val miDOUBLE = 9
  private val miINT64 = 12; private val miUINT64 = 13
  private val miMATRIX = 14; private val miCOMPRESSED = 15
  private val miUTF8 = 16

  // array classes
  private val mxCELL = 1; private val mxSTRUCT = 2; private val mxCHAR = 4
  private val mxDOUBLE = 6; private val mxSINGLE = 7
  private val mxINT8 = 8; private val mxUINT8 = 9
  private val mxINT16 = 10; private val mxUINT16 = 11
  private val mxINT32 = 12; private val mxUINT32 = 13

  /** Parse a .mat byte array → top-level variable name → value. */
  def parse(bytes: Array[Byte]): Map[String, MatValue] = {
    require(bytes.length > 128, "not a MAT-file: too short")
    val endian = ByteBuffer.wrap(bytes, 126, 2).get(126).toChar
    val order = if (endian == 'I') ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val buf = ByteBuffer.wrap(bytes).order(order)
    buf.position(128)
    var out = Map.empty[String, MatValue]
    while (buf.remaining() >= 8) {
      val (dtype, payload) = readElement(buf)
      dtype match {
        case `miCOMPRESSED` =>
          val inflated = inflate(payload)
          val inner = ByteBuffer.wrap(inflated).order(order)
          while (inner.remaining() >= 8) {
            val (t2, p2) = readElement(inner)
            if (t2 == miMATRIX) {
              val (name, v) = parseMatrix(ByteBuffer.wrap(p2).order(order))
              out += name -> v
            }
          }
        case `miMATRIX` =>
          val (name, v) = parseMatrix(ByteBuffer.wrap(payload).order(order))
          out += name -> v
        case _ => // skip other top-level elements
      }
    }
    out
  }

  /** Read one tagged element (handles the small-element 4-byte format);
    * returns (type, payload) with the buffer advanced past padding. */
  private def readElement(buf: ByteBuffer): (Int, Array[Byte]) = {
    val tagPos = buf.position()
    val word = buf.getInt(tagPos)
    val smallSize = (word >>> 16) & 0xffff
    if (smallSize != 0) {
      // small element: type in low 16 bits, data in the next 4 bytes
      val dtype = word & 0xffff
      val data = new Array[Byte](smallSize)
      buf.position(tagPos + 4)
      buf.get(data)
      buf.position(tagPos + 8)
      (dtype, data)
    } else {
      val dtype = buf.getInt(tagPos)
      val size = buf.getInt(tagPos + 4)
      val data = new Array[Byte](size)
      buf.position(tagPos + 8)
      buf.get(data)
      // pad to 8-byte boundary
      val pad = (8 - (size % 8)) % 8
      buf.position(math.min(buf.position() + pad, buf.limit()))
      (dtype, data)
    }
  }

  private def inflate(z: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(z)
    val out = new java.io.ByteArrayOutputStream(z.length * 4)
    val chunk = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(chunk)
      if (n == 0 && inf.needsInput()) throw new RuntimeException("truncated zlib")
      out.write(chunk, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private def numericData(dtype: Int, payload: Array[Byte],
                          order: ByteOrder): Array[Double] = {
    val b = ByteBuffer.wrap(payload).order(order)
    dtype match {
      case `miDOUBLE` => Array.fill(payload.length / 8)(b.getDouble())
      case `miSINGLE` => Array.fill(payload.length / 4)(b.getFloat().toDouble)
      case `miINT8` => payload.map(_.toDouble)
      case `miUINT8` => payload.map(x => (x & 0xff).toDouble)
      case `miINT16` => Array.fill(payload.length / 2)(b.getShort().toDouble)
      case `miUINT16` => Array.fill(payload.length / 2)((b.getShort() & 0xffff).toDouble)
      case `miINT32` => Array.fill(payload.length / 4)(b.getInt().toDouble)
      case `miUINT32` => Array.fill(payload.length / 4)((b.getInt().toLong & 0xffffffffL).toDouble)
      case `miINT64` | `miUINT64` => Array.fill(payload.length / 8)(b.getLong().toDouble)
      case other => throw new RuntimeException(s"unsupported numeric type $other")
    }
  }

  /** Parse a miMATRIX payload → (name, value). */
  private def parseMatrix(buf: ByteBuffer): (String, MatValue) = {
    val order = buf.order()
    val (_, flagBytes) = readElement(buf) // array flags (miUINT32 ×2)
    val clazz = flagBytes(0) & 0xff
    val (_, dimBytes) = readElement(buf)
    val dims = {
      val b = ByteBuffer.wrap(dimBytes).order(order)
      Array.fill(dimBytes.length / 4)(b.getInt())
    }
    val (_, nameBytes) = readElement(buf)
    val name = new String(nameBytes, "US-ASCII")

    val value: MatValue = clazz match {
      case `mxCHAR` =>
        val (t, payload) = readElement(buf)
        val s = t match {
          case `miUTF8` => new String(payload, "UTF-8")
          case _ => // UINT16 code units
            val b = ByteBuffer.wrap(payload).order(order)
            new String(Array.fill(payload.length / 2)(b.getShort().toChar))
        }
        MatChars(s)
      case `mxSTRUCT` =>
        val (_, fnLenBytes) = readElement(buf)
        val fieldNameLen = ByteBuffer.wrap(fnLenBytes).order(order).getInt()
        val (_, fnBytes) = readElement(buf)
        val nFields = fnBytes.length / fieldNameLen
        val names = (0 until nFields).map { i =>
          new String(fnBytes, i * fieldNameLen, fieldNameLen, "US-ASCII")
            .takeWhile(c => c != ' ' && c != 0.toChar)
        }
        val fields = names.map { fn =>
          val (_, p) = readElement(buf)
          val (_, v) = parseMatrix(ByteBuffer.wrap(p).order(order))
          fn -> v
        }.toMap
        MatStruct(fields)
      case `mxCELL` =>
        val items = scala.collection.mutable.ArrayBuffer[MatValue]()
        while (buf.remaining() >= 8) {
          val (_, p) = readElement(buf)
          items += parseMatrix(ByteBuffer.wrap(p).order(order))._2
        }
        MatCell(items.toSeq)
      case _ => // numeric classes: real part element
        val (t, payload) = readElement(buf)
        MatNum(dims, numericData(t, payload, order))
    }
    (name, value)
  }
}
