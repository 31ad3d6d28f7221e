package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Minimal read-only SQLite 3 file parser — enough of the on-disk format
 * (https://www.sqlite.org/fileformat2.html) to read RBR `.rsk` deployments
 * the way the reference does with the sqlite3 module
 * (stglib/rsk/rsk2cdf.py:34-52, SELECTs on `data`/`burstdata` at :193-276,
 * sampling metadata tables via stglib/core/utils.py:1417-1491).
 *
 * Supports: table b-trees (leaf 0x0D / interior 0x05), varint records, all
 * scalar serial types, single-level overflow chains. No indices, no WAL —
 * `.rsk` files are written once by the instrument and read whole.
 *
 * Scale: one `.rsk` file is one deployment (MBs); files parallelize via
 * Spark's binaryFile source — one task per file, same distribution shape as
 * the PD0/81R readers.
 */
object Sqlite {

  final case class Db(bytes: Array[Byte], pageSize: Int,
                      tables: Map[String, TableInfo])
  final case class TableInfo(name: String, rootPage: Int, columns: Seq[String],
                             rowidAlias: Boolean)

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** (value, bytesConsumed) of a SQLite varint (big-endian 7-bit groups). */
  private def varint(b: Array[Byte], o: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(o + i)
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(o + 8) & 0xff), 9)
  }

  def open(bytes: Array[Byte]): Db = {
    require(new String(bytes, 0, 15, "US-ASCII") == "SQLite format 3",
      "not a SQLite database")
    val ps = u16(bytes, 16) match { case 1 => 65536; case n => n }
    val db0 = Db(bytes, ps, Map.empty)
    // sqlite_master rows: (type, name, tbl_name, rootpage, sql)
    val tables = scanTable(db0, 1).flatMap { rec =>
      (rec(0), rec(1), rec(3), rec(4)) match {
        case ("table", name: String, root: Long, sql: String) =>
          Some(name.toLowerCase -> TableInfo(name, root.toInt,
            parseColumns(sql), hasRowidAlias(sql)))
        case _ => None
      }
    }.toMap
    db0.copy(tables = tables)
  }

  /** True when the FIRST column is declared INTEGER PRIMARY KEY — SQLite
    * then stores it as the rowid and records carry serial type NULL there
    * (fileformat2.html "rowid aliases"). */
  private[io] def hasRowidAlias(sql: String): Boolean = {
    val body = sql.substring(sql.indexOf('(') + 1)
    val firstDef = body.split(",")(0).trim.toLowerCase
    firstDef.matches(".*\\binteger\\s+primary\\s+key\\b.*")
  }

  /** Column names from CREATE TABLE DDL (top-level comma split; first token
    * per definition; table constraints skipped). */
  private[io] def parseColumns(sql: String): Seq[String] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    var depth = 0
    val parts = scala.collection.mutable.ArrayBuffer.empty[StringBuilder]
    parts += new StringBuilder
    body.foreach {
      case '(' => depth += 1; parts.last += '('
      case ')' => depth -= 1; parts.last += ')'
      case ',' if depth == 0 => parts += new StringBuilder
      case c => parts.last += c
    }
    val constraintKw = Set("primary", "unique", "check", "foreign", "constraint")
    parts.map(_.toString.trim).filter(_.nonEmpty)
      .map(p => p.split("[\\s(]+")(0).stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("[").stripSuffix("]").stripPrefix("`").stripSuffix("`"))
      .filterNot(c => constraintKw(c.toLowerCase)).toSeq
  }

  /** All records of the table rooted at `page`, in rowid order. Values are
    * null / Long / Double / String / Array[Byte]; element 0 substitutes the
    * rowid when the first column is an INTEGER PRIMARY KEY alias (serial
    * type NULL in the record). */
  def scanTable(db: Db, page: Int): Seq[Seq[Any]] =
    scanTable(db, page, rowidAlias = true)

  /** rowidAlias governs whether a NULL serial type in column 0 is replaced
    * by the record's rowid (INTEGER PRIMARY KEY alias) or kept as NULL. */
  def scanTable(db: Db, page: Int, rowidAlias: Boolean): Seq[Seq[Any]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    walk(db, page, out, rowidAlias)
    out.toSeq
  }

  private def walk(db: Db, page: Int, out: scala.collection.mutable.ArrayBuffer[Seq[Any]],
                   rowidAlias: Boolean): Unit = {
    val b = db.bytes
    val base = (page - 1) * db.pageSize
    val hdr = if (page == 1) base + 100 else base
    val ptype = b(hdr) & 0xff
    val ncells = u16(b, hdr + 3)
    ptype match {
      case 0x05 => // interior table page
        val cellPtrs = (0 until ncells).map(i => base + u16(b, hdr + 12 + 2 * i))
        cellPtrs.foreach { off => walk(db, u32(b, off).toInt, out, rowidAlias) }
        walk(db, u32(b, hdr + 8).toInt, out, rowidAlias) // rightmost child
      case 0x0d => // leaf table page
        var i = 0
        while (i < ncells) {
          val off = base + u16(b, hdr + 8 + 2 * i)
          val (payloadLen, n1) = varint(b, off)
          val (rowid, n2) = varint(b, off + n1)
          val payload = readPayload(db, off + n1 + n2, payloadLen.toInt)
          out += decodeRecord(payload, rowid, rowidAlias)
          i += 1
        }
      case other =>
        throw new IllegalStateException(f"unexpected page type 0x$other%02x")
    }
  }

  /** Payload with overflow-chain reassembly (fileformat2.html §B-tree Pages:
    * leaf max local = U-35, min local = (U-12)*32/255-23). */
  private def readPayload(db: Db, off: Int, total: Int): Array[Byte] = {
    val u = db.pageSize - 0 // reserved space assumed 0
    val maxLocal = u - 35
    if (total <= maxLocal)
      return java.util.Arrays.copyOfRange(db.bytes, off, off + total)
    val minLocal = (u - 12) * 32 / 255 - 23
    val k = minLocal + (total - minLocal) % (u - 4)
    val local = if (k <= maxLocal) k else minLocal
    val payload = new Array[Byte](total)
    System.arraycopy(db.bytes, off, payload, 0, local)
    var next = u32(db.bytes, off + local).toInt
    var done = local
    while (next != 0 && done < total) {
      val pbase = (next - 1) * db.pageSize
      val take = math.min(total - done, db.pageSize - 4)
      System.arraycopy(db.bytes, pbase + 4, payload, done, take)
      done += take
      next = u32(db.bytes, pbase).toInt
    }
    payload
  }

  private def decodeRecord(p: Array[Byte], rowid: Long,
                           rowidAlias: Boolean): Seq[Any] = {
    val (hdrLen, n0) = varint(p, 0)
    val types = scala.collection.mutable.ArrayBuffer.empty[Long]
    var o = n0
    while (o < hdrLen) {
      val (t, n) = varint(p, o)
      types += t
      o += n
    }
    var data = hdrLen.toInt
    types.zipWithIndex.map { case (t, idx) =>
      val bb = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
      t match {
        case 0 => if (idx == 0 && rowidAlias) rowid else null
        case 1 => val v = p(data).toLong; data += 1; v
        case 2 => val v = bb.getShort(data).toLong; data += 2; v
        case 3 =>
          val v = ((p(data).toLong << 16) | ((p(data + 1) & 0xffL) << 8) |
            (p(data + 2) & 0xffL)); data += 3; v
        case 4 => val v = bb.getInt(data).toLong; data += 4; v
        case 5 =>
          val v = ((bb.getShort(data).toLong << 32) |
            (bb.getInt(data + 2) & 0xffffffffL)); data += 6; v
        case 6 => val v = bb.getLong(data); data += 8; v
        case 7 => val v = bb.getDouble(data); data += 8; v
        case 8 => 0L
        case 9 => 1L
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt
          val v = new String(p, data, len, "UTF-8"); data += len; v
        case n if n >= 12 =>
          val len = ((n - 12) / 2).toInt
          val v = java.util.Arrays.copyOfRange(p, data, data + len); data += len; v
      }
    }.toSeq
  }
}
