package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Nearest-centroid assignment `argmin_j (|c_j|² − 2·x·c_j)` (ties → lowest
 * j) over a model-sized centroid matrix — the Lloyd assignment that was
 * previously built as `least(struct(lit(|c_j|²) − 2·dot(x, array(lit…)))…)`
 * with one LITERAL per centroid coordinate.
 *
 * The literal form is numerically fine but re-compiles on every Lloyd
 * iteration: new centroid literals → new generated source → a fresh janino
 * compilation of a k·dims-term method, per iteration, per fused problem,
 * on the DRIVER (measured: the pq/ivf family spent more wall in codegen
 * compilation than in its tasks at sf0.1). Here the matrix rides along as
 * a REFERENCE OBJECT, so the generated source is identical across
 * iterations and models — one compilation per session, cache hits after.
 *
 * Exactness (KmAssignSpec proves bit-equality against the literal form):
 *  - per-centroid distance d_j = c2_j − 2.0·s_j with c2_j precomputed by
 *    the same left-to-right Scala sum the literal form embedded, and s_j
 *    the same min-length ascending-index loop as [[ArrayMath.DotProduct]]
 *    (ArrayData.getDouble, so null elements read the same zeroed slots);
 *  - selection replicates `least(struct(d, j))`: strict
 *    `Double.compare(d, best) < 0` keeps the lowest j on ties and orders
 *    NaN greatest, exactly Spark's double ordering;
 *  - a NULL input array replicates the struct form's outcome: every d_j
 *    is null, the struct ordering compares the j field, and j=0 wins —
 *    so the expression returns 0 (never null; `nullable = false`);
 *  - `quantize` reproduces quantAssignExpr's micro-unit floor
 *    (`floor(v·1e6)` cast long, back to double, /1e6) inside the loop.
 */
case class KmArgminExpr(child: Expression, cents: Seq[Seq[Double]],
                        quantize: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(cents.nonEmpty, "centroid matrix must be non-empty")

  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def nullable: Boolean = false

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  // |c_j|² via the same left-to-right sum the literal form used
  @transient private lazy val c2: Array[Double] =
    cents.map(_.map(v => v * v).sum).toArray

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) 0L
    else KmAssign.argmin(a.asInstanceOf[ArrayData], matrix, c2, quantize)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val m = ctx.addReferenceObj("kmMatrix", matrix, "double[][]")
    val cc = ctx.addReferenceObj("kmC2", c2, "double[]")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.KmAssign$$.MODULE$$.argmin(
            ${c.value}, $m, $cc, $quantize);
        }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object KmAssign {
  import org.apache.spark.sql.{GraftColumnBridge => EU}

  /** Shared by eval and codegen — the two paths cannot diverge. */
  def argmin(x: ArrayData, m: Array[Array[Double]], c2: Array[Double],
             quantize: Boolean): Long = {
    val xn = x.numElements()
    var bestD = java.lang.Double.NaN
    var bestJ = 0L
    var first = true
    var j = 0
    while (j < m.length) {
      val c = m(j)
      val n = if (xn < c.length) xn else c.length
      var s = 0.0
      var i = 0
      if (quantize) {
        while (i < n) {
          val q = math.floor(x.getDouble(i) * 1000000.0).toLong.toDouble / 1000000.0
          s += q * c(i)
          i += 1
        }
      } else {
        while (i < n) { s += x.getDouble(i) * c(i); i += 1 }
      }
      val d = c2(j) - 2.0 * s
      if (first || java.lang.Double.compare(d, bestD) < 0) {
        bestD = d; bestJ = j; first = false
      }
      j += 1
    }
    bestJ
  }

  /** Assignment column over a centroid matrix; 0 for a null input array
    * (the literal-struct form's outcome). */
  def argminCol(x: Column, cents: Array[Array[Double]],
                quantize: Boolean): Column =
    EU.column(KmArgminExpr(EU.expression(x),
      cents.toSeq.map(_.toSeq), quantize))
}
