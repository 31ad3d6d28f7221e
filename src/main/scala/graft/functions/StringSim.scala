package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd Jaro-Winkler similarity — the record-linkage edit metric
 * (Winkler 1990): Jaro match/transposition score with a common-prefix
 * boost (p = 0.1, prefix ≤ 4) applied only above the classic 0.7
 * threshold. This is bit-for-bit the formula DuckDB's
 * `jaro_winkler_similarity` evaluates (verified exhaustively on corpus
 * strings), so results are exactly oracle-checkable.
 *
 * Operates on the UTF-8 BYTES of the inputs (byte = code point for
 * ASCII corpora; both engines agree on that representation). The DP
 * state is two small boolean arrays — per-row allocation is bounded by
 * string length, and the expression stays inside whole-stage codegen
 * (the generated code calls one static method, no boxing).
 */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object JaroWinkler {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.getBytes
    val s2 = ub.getBytes
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (l < maxP && s1(l) == s2(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Column form: `jaroWinkler(a, b)`. */
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.{GraftColumnBridge => EU}
    EU.column(JaroWinkler(EU.expression(a), EU.expression(b)))
  }
}
