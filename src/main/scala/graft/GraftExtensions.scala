package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, JaroWinkler, SortedIntersectCount}

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
 *  - `graft_sorted_intersect(a, b)`  — |a ∩ b| of two sorted BIGINT arrays
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
  }
}
