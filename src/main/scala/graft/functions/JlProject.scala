package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Codegen'd JL ±1 random projection of one embedding: out_j =
 * (Σ_i floor(emb_i·10⁶)·s_{j,i}).toDouble / 10⁶ · scale over a LITERAL
 * sign matrix.
 *
 * Replaces the explode→join→re-aggregate formulation (corpus×dims rows
 * through a broadcast join and a (vec, out_dim) hash aggregate — two
 * data-sized exchanges) with a pure projection: the sign matrix is
 * model-sized by construction (outDims×dims ±1 entries), so baking it
 * into the expression is a model attach, not a data broadcast. Values
 * are bit-identical to the join form (JlProjectSpec): xi quantization is
 * the same floor, the accumulator is the same exact long sum (order-free),
 * and the final scale applies in the same operation order
 * ((acc/10⁶)·scale). Mirrors the join form's null/edge semantics: a null
 * or EMPTY embedding yields NULL (the explode form emitted no rows — the
 * caller explodes this array, so no rows come out either); null elements
 * contribute nothing, and an out-dim with zero non-null terms is a null
 * entry (sum-over-nulls semantics).
 */
case class JlProjectExpr(child: Expression, signs: Array[Byte],
                         dims: Int, outDims: Int, scale: Double)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(signs.length == dims * outDims,
    s"sign matrix must be outDims×dims = ${outDims * dims}, got ${signs.length}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  // NULL for a non-null EMPTY input array — must not inherit child
  // nullability: with a non-nullable embedding column the optimizer would
  // fold away the IsNotNull guard in jlProjectArrays, and nullSafeCodeGen
  // would write `isNull = true` into a slot the planner believes
  // constant-false (janino failure → interpreted fallback, then a null in
  // a non-nullable slot downstream). r17 advice, fixed r18.
  override def nullable: Boolean = true
  // the raw sign array compares by reference; semantic equality (and so
  // canonicalized-plan equality, cache reuse and subexpression
  // elimination) needs content comparison. r17 advice, fixed r18.
  override def equals(other: Any): Boolean = other match {
    case o: JlProjectExpr =>
      child == o.child && dims == o.dims && outDims == o.outDims &&
        scale == o.scale && java.util.Arrays.equals(signs, o.signs)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(dims), Int.box(outDims),
      Double.box(scale), Int.box(java.util.Arrays.hashCode(signs)))

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    if (n == 0) return null
    val lim = math.min(n, dims)
    val acc = new Array[Long](outDims)
    var any = false
    var i = 0
    while (i < lim) {
      if (!e.isNullAt(i)) {
        any = true
        val xi = math.floor(e.getDouble(i) * 1000000.0).toLong
        var j = 0
        while (j < outDims) {
          acc(j) += xi * signs(j * dims + i)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](outDims)
    if (any) {
      var j = 0
      while (j < outDims) { out(j) = acc(j).toDouble / 1000000.0 * scale; j += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sref = ctx.addReferenceObj("jlSigns", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, e => {
      val n = ctx.freshName("n")
      val lim = ctx.freshName("lim")
      val acc = ctx.freshName("acc")
      val any = ctx.freshName("any")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      val out = ctx.freshName("out")
      s"""
         |int $n = $e.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $lim = java.lang.Math.min($n, $dims);
         |  long[] $acc = new long[$outDims];
         |  boolean $any = false;
         |  for (int $i = 0; $i < $lim; $i++) {
         |    if (!$e.isNullAt($i)) {
         |      $any = true;
         |      long $xi = (long) java.lang.Math.floor($e.getDouble($i) * 1000000.0);
         |      for (int $j = 0; $j < $outDims; $j++) {
         |        $acc[$j] += $xi * $sref[$j * $dims + $i];
         |      }
         |    }
         |  }
         |  Object[] $out = new Object[$outDims];
         |  if ($any) {
         |    for (int $j = 0; $j < $outDims; $j++) {
         |      $out[$j] = (Object) (((double) $acc[$j]) / 1000000.0 * $scale);
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object JlProject {
  import org.apache.spark.sql.{GraftColumnBridge => EU}

  /** The md5-parity ±1 sign for (j, i) — the same value both engines
    * derive in-engine: first 8 hex chars of md5("j_i") as a long, even →
    * +1 else −1. */
  def sign(j: Int, i: Int): Byte = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${j}_${i}".getBytes("UTF-8"))
    // first 8 hex chars = first 4 digest bytes as an unsigned 32-bit value
    val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    if (v % 2 == 0) 1 else -1
  }

  /** Flat outDims×dims sign matrix, row-major in out-dim. */
  def signMatrix(dims: Int, outDims: Int): Array[Byte] =
    Array.tabulate(outDims * dims)(x => sign(x / dims, x % dims + 1))

  def project(emb: Column, dims: Int, outDims: Int, scale: Double): Column =
    EU.column(JlProjectExpr(EU.expression(emb),
      signMatrix(dims, outDims), dims, outDims, scale))
}
