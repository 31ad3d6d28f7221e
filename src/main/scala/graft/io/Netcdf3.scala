package graft.io

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * netCDF-3 "classic" writer/reader (CDF-1, big-endian;
 * https://docs.unidata.ucar.edu/netcdf-c/current/file_format_specifications.html)
 * — the reference's final export step is `to_netcdf(unlimited_dims=["time"])`
 * (stglib/rsk/csv2cdf.py:259-264). Pure JVM, no native libs.
 *
 * Writer shape: a long-format DataFrame becomes 1-D record variables over
 * the unlimited `time` dimension, with global + per-variable attributes —
 * the layout every stglib time-series output uses. Rows stream through
 * `toLocalIterator` (no full collect); one file = one deployment, matching
 * the reference's file granularity. At cluster scale, exports fan out as
 * one file per deployment/profile partition (Sink.writeParquet(partitionBy)
 * upstream decides the split).
 *
 * Types: DoubleType→NC_DOUBLE, FloatType→NC_FLOAT, IntegerType→NC_INT,
 * LongType→NC_DOUBLE (classic has no 64-bit int; the reference's CF time
 * encoding is double-based).
 */
object Netcdf3 {

  private val NC_DIMENSION = 0x0a
  private val NC_VARIABLE = 0x0b
  private val NC_ATTRIBUTE = 0x0c
  private val NC_CHAR = 2
  private val NC_INT = 4
  private val NC_FLOAT = 5
  private val NC_DOUBLE = 6

  private def pad4(n: Int): Int = (4 - n % 4) % 4

  private def writeName(o: DataOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    o.writeInt(b.length); o.write(b)
    (0 until pad4(b.length)).foreach(_ => o.writeByte(0))
  }

  private def writeTextAttr(o: DataOutputStream, name: String, v: String): Unit = {
    writeName(o, name)
    o.writeInt(NC_CHAR)
    val b = v.getBytes("UTF-8")
    o.writeInt(b.length); o.write(b)
    (0 until pad4(b.length)).foreach(_ => o.writeByte(0))
  }

  private def ncType(dt: DataType): Int = dt match {
    case FloatType => NC_FLOAT
    case IntegerType => NC_INT
    case _ => NC_DOUBLE
  }
  private def ncSize(t: Int): Int = if (t == NC_INT || t == NC_FLOAT) 4 else 8

  /** Write `df`'s numeric columns as record variables along the unlimited
    * `time` dimension. `attrs` = global attributes; `varAttrs` = per-column
    * attributes (units/long_name/...). Column order is preserved. */
  def write(df: DataFrame, path: String, attrs: Seq[(String, String)] = Nil,
            varAttrs: Map[String, Seq[(String, String)]] = Map.empty): Long = {
    val fields = df.schema.fields.toSeq
    // fail BEFORE any bytes hit disk: a non-numeric column would otherwise
    // throw mid-stream and leave a corrupt half-written file
    val bad = fields.filterNot(f => f.dataType match {
      case DoubleType | FloatType | IntegerType | LongType | ShortType |
           ByteType => true
      case _ => false
    })
    require(bad.isEmpty,
      s"netCDF-3 export supports numeric columns only; cast or drop: " +
        bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    val types = fields.map(f => ncType(f.dataType))
    val recSize = types.map(ncSize).sum

    val header = new java.io.ByteArrayOutputStream()
    val h = new DataOutputStream(header)
    h.writeBytes("CDF"); h.writeByte(1)
    h.writeInt(0) // numrecs patched after streaming
    // dim_list: one record dim "time" (size 0 = unlimited)
    h.writeInt(NC_DIMENSION); h.writeInt(1)
    writeName(h, "time"); h.writeInt(0)
    // global attributes
    if (attrs.nonEmpty) {
      h.writeInt(NC_ATTRIBUTE); h.writeInt(attrs.length)
      attrs.foreach { case (k, v) => writeTextAttr(h, k, v) }
    } else { h.writeInt(0); h.writeInt(0) }
    // var_list — begins need the final header size: compute it first
    val varMetaSize = fields.zipWithIndex.map { case (f, _) =>
      val nameB = f.name.getBytes("UTF-8").length
      val va = varAttrs.getOrElse(f.name, Nil)
      val vaSize = if (va.isEmpty) 8 else 8 + va.map { case (k, v) =>
        val kb = k.getBytes("UTF-8").length; val vb = v.getBytes("UTF-8").length
        (4 + kb + pad4(kb)) + 8 + (vb + pad4(vb)) // type+nelems then raw chars
      }.sum
      (4 + nameB + pad4(nameB)) + 4 + 4 + vaSize + 4 + 4 + 4
    }.sum
    val headerSize = header.size() + 8 + varMetaSize
    h.writeInt(NC_VARIABLE); h.writeInt(fields.length)
    var begin = headerSize
    fields.zipWithIndex.foreach { case (f, i) =>
      writeName(h, f.name)
      h.writeInt(1); h.writeInt(0) // 1 dim: dimid 0 (time)
      val va = varAttrs.getOrElse(f.name, Nil)
      if (va.nonEmpty) {
        h.writeInt(NC_ATTRIBUTE); h.writeInt(va.length)
        va.foreach { case (k, v) => writeTextAttr(h, k, v) }
      } else { h.writeInt(0); h.writeInt(0) }
      h.writeInt(types(i))
      h.writeInt(ncSize(types(i))) // vsize (per-record contribution)
      h.writeInt(begin)
      begin += ncSize(types(i))
    }
    require(header.size() == headerSize, s"header size ${header.size()} != computed $headerSize")

    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(path), 1 << 20))
    out.write(header.toByteArray)
    // record data: variables interleaved per record
    var nrecs = 0L
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      fields.zipWithIndex.foreach { case (f, i) =>
        val isNull = row.isNullAt(i)
        types(i) match {
          case NC_INT =>
            out.writeInt(if (isNull) Int.MinValue
              else row.get(i).asInstanceOf[Number].intValue())
          case NC_FLOAT =>
            out.writeFloat(if (isNull) Float.NaN
              else row.get(i).asInstanceOf[Number].floatValue())
          case _ =>
            out.writeDouble(if (isNull) Double.NaN
              else row.get(i).asInstanceOf[Number].doubleValue())
        }
      }
      nrecs += 1
    }
    out.close()
    // patch numrecs at offset 4
    val raf = new java.io.RandomAccessFile(path, "rw")
    raf.seek(4)
    raf.writeInt(nrecs.toInt)
    raf.close()
    nrecs
  }

  // ---- minimal reader (raw-.cdf re-open + writer validation) ----------

  final case class NcVar(name: String, ncType: Int, begin: Long,
                         attrs: Map[String, String])
  final case class NcFile(numrecs: Int, dims: Seq[(String, Int)],
                          attrs: Map[String, String], vars: Seq[NcVar],
                          bytes: Array[Byte]) {
    def recSize: Int = vars.map(v => ncSize(v.ncType)).sum
    /** Column of a 1-D record variable as doubles. */
    def column(name: String): Array[Double] = {
      val v = vars.find(_.name == name).getOrElse(
        throw new NoSuchElementException(name))
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      Array.tabulate(numrecs) { r =>
        val off = (v.begin + r.toLong * recSize).toInt
        v.ncType match {
          case NC_INT => bb.getInt(off).toDouble
          case NC_FLOAT => bb.getFloat(off).toDouble
          case _ => bb.getDouble(off)
        }
      }
    }
  }

  def read(bytes: Array[Byte]): NcFile = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F' &&
      bytes(3) == 1, "not a CDF-1 classic file")
    var pos = 4
    val numrecs = bb.getInt(pos); pos += 4
    def readName(): String = {
      val n = bb.getInt(pos); pos += 4
      val s = new String(bytes, pos, n, "UTF-8")
      pos += n + pad4(n); s
    }
    def readAttrs(): Map[String, String] = {
      val tag = bb.getInt(pos); val cnt = bb.getInt(pos + 4); pos += 8
      require(tag == NC_ATTRIBUTE || (tag == 0 && cnt == 0), s"bad attr tag $tag")
      (0 until cnt).map { _ =>
        val k = readName()
        val t = bb.getInt(pos); pos += 4
        val n = bb.getInt(pos); pos += 4
        require(t == NC_CHAR, "only text attrs supported")
        val v = new String(bytes, pos, n, "UTF-8"); pos += n + pad4(n)
        k -> v
      }.toMap
    }
    val dimTag = bb.getInt(pos); val ndims = bb.getInt(pos + 4); pos += 8
    require(dimTag == NC_DIMENSION || (dimTag == 0 && ndims == 0))
    val dims = (0 until ndims).map { _ =>
      val nm = readName(); val sz = bb.getInt(pos); pos += 4; nm -> sz }
    val gatts = readAttrs()
    val varTag = bb.getInt(pos); val nvars = bb.getInt(pos + 4); pos += 8
    require(varTag == NC_VARIABLE || (varTag == 0 && nvars == 0))
    val vars = (0 until nvars).map { _ =>
      val nm = readName()
      val nd = bb.getInt(pos); pos += 4 + 4 * nd
      val va = readAttrs()
      val t = bb.getInt(pos); pos += 4
      pos += 4 // vsize
      val begin = bb.getInt(pos).toLong; pos += 4
      NcVar(nm, t, begin, va)
    }
    NcFile(numrecs, dims, gatts, vars, bytes)
  }
}
