package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over embedding columns
 * (BASELINE.json north star). Two paths:
 *
 *  - [[bruteTopK]] — exact cosine top-k via a pair join + higher-order
 *    functions (`zip_with`/`aggregate`, codegen'd, no UDF). O(n²·d); the
 *    CORRECTNESS baseline and fine up to ~10⁴ vectors per scope.
 *  - [[lshTopK]] — random-hyperplane LSH: b sign-bits bucket the vectors,
 *    candidates share a bucket, exact cosine re-rank inside. At 100 TB the
 *    bucket join replaces the quadratic blowup with an equi-join keyed on
 *    the signature (IVF-style probing = repeat with rotated hyperplane sets).
 *
 * Dot products accumulate in array-index order (sequential `aggregate`),
 * making results deterministic and engine-portable.
 */
object Similarity {

  /** Sequential-order dot product of two double array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Exact cosine top-k neighbors per query vector.
    * Output: (vec_id, neighbor_id, cosine, rank). */
  def bruteTopK(df: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val a = df.select(col(idCol).as("vec_id"), asDouble(col(embCol)).as("ea"))
    val b = df.select(col(idCol).as("neighbor_id"), asDouble(col(embCol)).as("eb"))
    val pairs = a.crossJoin(b).filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("ea"), col("eb")) / (norm(col("ea")) * norm(col("eb"))))
    val w = Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplane component: sin((j+1)·(i+1)) for
    * hyperplane j, dimension i — portable to any engine, no RNG state. */
  def hyperplaneSignature(emb: Column, dims: Int, bits: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val d = aggregate(
        zip_with(emb, expr(s"transform(sequence(1, $dims), i -> sin(${j + 1}.0 * i))"),
          (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0, expr(s"shiftleft(cast(1 as bigint), $j)")).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** LSH-bucketed cosine top-k: exact re-rank within shared buckets.
    * Recall < 1 by construction; increase bits→buckets tradeoff per scale. */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              dims: Int, bits: Int, k: Int): DataFrame = {
    val sig = df.select(col(idCol).as("vec_id"), asDouble(col(embCol)).as("e"))
      .withColumn("bucket", hyperplaneSignature(col("e"), dims, bits))
    val a = sig.select(col("vec_id"), col("e").as("ea"), col("bucket"))
    val b = sig.select(col("vec_id").as("neighbor_id"), col("e").as("eb"), col("bucket"))
    val pairs = a.join(b, Seq("bucket")).filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("ea"), col("eb")) / (norm(col("ea")) * norm(col("eb"))))
    val w = Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "bucket", "neighbor_id", "cosine", "rank")
  }
}
