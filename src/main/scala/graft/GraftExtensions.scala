package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{AdjacentWordPairs, DotProduct, DupNgramFraction, IntDotProduct, JaroWinkler, NfcNormalize, QualityScore, ShingleKeys3, SortedIntersectCount, WordNgramsExpr}

/**
 * Injectable Spark session extensions — the standard deployment path for
 * graft's native Catalyst expressions on a shared cluster:
 *
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *
 * registers the codegen'd array kernels as SQL functions in every session
 * without driver-side code:
 *
 *  - `graft_dot(a, b)`               — dot product of two DOUBLE arrays
 *  - `graft_int_dot(a, b)`           — BIGINT dot product of two INT arrays
 *  - `graft_sorted_intersect(a, b)`  — |a ∩ b| of two sorted BIGINT arrays
 *  - `graft_nfc(s)`                  — Unicode NFC normalization
 *  - `graft_quality(s)`              — single-pass text-quality score
 *  - `graft_dup_ngram_frac(s, n)`    — duplicate word-n-gram fraction
 *  - `graft_word_ngrams(s, n)`       — space-joined word n-gram array
 *  - `graft_adjacent_pairs(s)`       — adjacent (w1, w2) token structs
 *  - `graft_shingle_keys3(s)`        — sorted distinct packed 3-shingles
 *
 * Both are full Catalyst `Expression`s with `doGenCode`, so they stay
 * inside whole-stage codegen (Spark's lambda HOFs are interpreted per
 * element and measured ~10x slower on the same workloads — NOTES round 1).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_int_dot"),
      new ExpressionInfo(classOf[IntDotProduct].getName, "graft_int_dot"),
      (exprs: Seq[Expression]) => IntDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_quality"),
      new ExpressionInfo(classOf[QualityScore].getName, "graft_quality"),
      (exprs: Seq[Expression]) => QualityScore(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_dup_ngram_frac"),
      new ExpressionInfo(classOf[DupNgramFraction].getName,
        "graft_dup_ngram_frac"),
      (exprs: Seq[Expression]) => DupNgramFraction(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgramsExpr].getName, "graft_word_ngrams"),
      (exprs: Seq[Expression]) => WordNgramsExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_adjacent_pairs"),
      new ExpressionInfo(classOf[AdjacentWordPairs].getName,
        "graft_adjacent_pairs"),
      (exprs: Seq[Expression]) => AdjacentWordPairs(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_keys3"),
      new ExpressionInfo(classOf[ShingleKeys3].getName, "graft_shingle_keys3"),
      (exprs: Seq[Expression]) => ShingleKeys3(exprs(0))))
  }
}
