package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd `CAST(conv(substring(md5(s), 1, nHex), 16, 10) AS BIGINT)` — the
 * deterministic cross-engine hash every oracle replays with DuckDB's md5.
 * The SQL form materializes the full 32-char hex string, substrings it and
 * re-parses the prefix char-by-char through `conv`, allocating a fresh
 * MessageDigest per row (commons-codec `md5Hex`); this expression computes
 * the same value directly from the digest bytes (the first nHex hex chars of
 * the digest ARE its first nHex nibbles) with one digest instance per
 * generated class. Value-identical by construction for 1 <= nHex <= 15
 * (< 2^60 always fits a positive signed long); Md5PrefixSpec proves equality
 * against the SQL form on ASCII/Unicode/empty/null corpora.
 */
case class Md5PrefixLong(child: Expression, nHex: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(nHex >= 1 && nHex <= 15,
    s"nHex must be in [1, 15] to stay a positive signed long; got $nHex")

  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val nib = (d(i >> 1) >> ((1 - (i & 1)) * 4)) & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("digest")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |$md.reset();
         |byte[] $d = $md.digest($c.getBytes());
         |long $v = 0L;
         |for (int $i = 0; $i < $nHex; $i++) {
         |  $v = ($v << 4) | (($d[$i >> 1] >> ((1 - ($i & 1)) * 4)) & 0xF);
         |}
         |${ev.value} = $v;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object Md5Prefix {
  import org.apache.spark.sql.{GraftColumnBridge => EU}

  /** First `nHex` hex chars of md5(s) as an unsigned BIGINT value. */
  def md5PrefixLong(c: Column, nHex: Int): Column =
    EU.column(Md5PrefixLong(EU.expression(c), nHex))
}
