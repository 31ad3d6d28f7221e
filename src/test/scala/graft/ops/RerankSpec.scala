package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Two-stage ANN invariants: the rerank stage only reorders stage-1
  * candidates, exact cosine ordering holds within each query's results,
  * and recall@k is 1.0 when the candidate set covers the truth. */
class RerankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def vecs(n: Int, dims: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.tabulate(dims)(_ => rnd.nextFloat())))
  }

  test("rerank output is a subset of ADC candidates, ordered by exact cosine") {
    import spark.implicits._
    val dims = 16
    val df = vecs(48, dims, 11).toDF("vec_id", "embedding")
    val cand = Similarity.pqTopK(df, "vec_id", "embedding", dims,
        m = 4, ksub = 8, iters = 2, nCells = 4, cellIters = 2, k = 8)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = Similarity.pqRerank(df, "vec_id", "embedding", dims,
      m = 4, ksub = 8, iters = 2, nCells = 4, cellIters = 2, kCand = 8, k = 3)
    val rows = rr.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getLong(r.fieldIndex("vec_id"))
      val n = r.getLong(r.fieldIndex("neighbor_id"))
      assert(cand.contains((q, n)), s"($q,$n) not an ADC candidate")
      assert(r.getInt(r.fieldIndex("rank")) <= 3)
    }
    // within each query, rank order follows cosine descending
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(rs.head.fieldIndex("rank")))
      val cos = byRank.map(_.getDouble(byRank.head.fieldIndex("cosine")))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("recall@k is 1.0 when candidates cover everything, in [0,1] otherwise") {
    import spark.implicits._
    val dims = 16
    val n = 24
    val df = vecs(n, dims, 23).toDF("vec_id", "embedding")
    // kCand >= n => stage 1 keeps every same-cell vector, so any query whose
    // exact top-3 lands in its own coarse cell must score recall == 1; and
    // every query's recall must match a from-definition recomputation
    val full = Similarity.annRecall(df, "vec_id", "embedding", dims,
      m = 4, ksub = 8, iters = 2, nCells = 2, cellIters = 2, kCand = n, k = 3)
    val fr = full.collect()
    assert(fr.length == n)
    val cells = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 2,
        dims = dims, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("cell"))).toMap
    val truth = Similarity.bruteTopK(df, "vec_id", "embedding", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, ps) => q -> ps.map(_._2).toSet }
    fr.foreach { r =>
      val q = r.getLong(r.fieldIndex("vec_id"))
      val rec = r.getDouble(r.fieldIndex("recall"))
      if (truth(q).forall(nb => cells(nb) == cells(q)))
        assert(rec == 1.0, s"query $q: cell-local truth but recall $rec")
    }
    assert(fr.exists(_.getDouble(fr.head.fieldIndex("recall")) == 1.0))
    // a constrained candidate budget keeps recall a valid fraction
    val tight = Similarity.annRecall(df, "vec_id", "embedding", dims,
      m = 4, ksub = 8, iters = 2, nCells = 4, cellIters = 2, kCand = 4, k = 3)
    tight.collect().foreach { r =>
      val rec = r.getDouble(r.fieldIndex("recall"))
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}
