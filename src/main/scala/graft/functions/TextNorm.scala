package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd Unicode NFC normalization — the canonical-composition pass a
 * curation pipeline runs BEFORE any content hashing or dedup (decomposed
 * `e + U+0301` and precomposed `é` must fingerprint identically or every
 * exact/MinHash/winnow stage silently treats equal texts as distinct).
 *
 * Cross-engine exact: `java.text.Normalizer` (JDK) and DuckDB's
 * `nfc_normalize` (utf8proc) both implement Unicode canonical composition,
 * which is stability-guaranteed across Unicode versions for assigned code
 * points — verified byte-identical on combining sequences, precomposed
 * Latin, compatibility ligatures (which NFC must NOT fold), CJK and emoji.
 *
 * Scale shape: pure per-row projection (no shuffle), one static call from
 * whole-stage codegen. The ASCII fast path returns the input UTF8String
 * untouched (NFC is the identity on ASCII, the overwhelming share of a
 * web corpus), so the String round-trip is paid only by rows that can
 * actually change.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($s);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object NfcNormalize {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(u: UTF8String): UTF8String = {
    val bytes = u.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) { // non-ASCII lead byte: take the slow path
        val s = u.toString
        val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
        return if (n == s) u else UTF8String.fromString(n)
      }
      i += 1
    }
    u // pure ASCII: NFC is the identity
  }

  /** Column form: `nfcNormalize(text)`. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.{GraftColumnBridge => EU}
    EU.column(NfcNormalize(EU.expression(c)))
  }
}
