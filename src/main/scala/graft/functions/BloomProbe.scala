package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/**
 * Codegen'd k-probe Bloom membership test over a literal word array — the
 * train-side prefilter of [[graft.ops.Curation.contaminationFlagsBloom]].
 *
 * The column-expression formulation (k `withColumn` probes + one AND-chain
 * filter) collapses under predicate pushdown into a FilterExec whose
 * conjuncts each inline the md5-derived key TWICE (word index + shift
 * amount), and FilterExec performs no subexpression elimination — measured
 * r17: 10 md5 evaluations per train gram, 38 executor-CPU-seconds of a
 * 4.7 s query at sf0.1. This expression evaluates the key child ONCE and
 * loops the k probes over constant arrays.
 *
 * The probe arithmetic mirrors `pmod(pmod(a*key + b, P), bits)` in Java
 * long arithmetic exactly (including any wrap), so positions agree
 * bit-for-bit with the build side's [[graft.ops.Sketches.bucketHash]]
 * columns — the filter is lossless by the no-false-negative property, and
 * the exact join downstream removes false positives, so the query result
 * is unchanged (same oracle as the bloom-free decontam_ngram).
 */
case class BloomContainsAll(child: Expression, words: Array[Long],
                            as: Array[Long], bs: Array[Long],
                            p: Long, bits: Int, wordBits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BooleanType
  override def inputTypes: Seq[DataType] = Seq(LongType)
  // raw long arrays compare by reference; content equality keeps
  // canonicalized plans (cache reuse, subexpression elimination) honest —
  // r17 advice, fixed r18
  override def equals(other: Any): Boolean = other match {
    case o: BloomContainsAll =>
      child == o.child && p == o.p && bits == o.bits &&
        wordBits == o.wordBits &&
        java.util.Arrays.equals(words, o.words) &&
        java.util.Arrays.equals(as, o.as) && java.util.Arrays.equals(bs, o.bs)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Long.box(p), Int.box(bits),
      Int.box(wordBits), Int.box(java.util.Arrays.hashCode(words)))

  private def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  override def nullSafeEval(input: Any): Any = {
    val key = input.asInstanceOf[Long]
    var i = 0
    while (i < as.length) {
      val pos = pmod(pmod(as(i) * key + bs(i), p), bits.toLong).toInt
      if (((words(pos / wordBits) >> (pos % wordBits)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val av = ctx.addReferenceObj("bloomAs", as, "long[]")
    val bv = ctx.addReferenceObj("bloomBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, key => {
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val pos = ctx.freshName("pos")
      val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = true;
         |for (int $i = 0; $i < ${as.length}; $i++) {
         |  long $t = ($av[$i] * $key + $bv[$i]) % ${p}L;
         |  if ($t < 0) $t += ${p}L;
         |  int $pos = (int) ($t % ${bits}L);
         |  if ((($w[$pos / $wordBits] >> ($pos % $wordBits)) & 1L) == 0L) {
         |    $ok = false; break;
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object BloomProbe {
  import org.apache.spark.sql.{GraftColumnBridge => EU}

  /** All-k-bits-set Bloom test of a LongType key column against literal
    * (words, hash-param) arrays. */
  def containsAll(key: Column, words: Array[Long],
                  params: Seq[(Int, Long, Long)], p: Long, bits: Int,
                  wordBits: Int): Column =
    EU.column(BloomContainsAll(EU.expression(key), words,
      params.map(_._2).toArray, params.map(_._3).toArray, p, bits, wordBits))
}
