package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd's k-means on well-separated clusters must recover them exactly,
  * with centroids equal to the quantized member means. */
class KmeansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("two separated blobs -> two pure clusters with exact-mean centroids") {
    import spark.implicits._
    // blob A around (0,0,...), blob B around (10,10,...); seeds are ids 0,1
    // (one in each blob), so one round converges and stays fixed
    val dims = 4
    val rnd = new scala.util.Random(5)
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Array.tabulate(dims)(_ => (base + rnd.nextDouble()).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val assign = Similarity.kmeansAssign(df, "vec_id", "embedding", 2, dims, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // purity: every even id shares cluster 0's seed (id 0), odd ids id 1's
    assert((0 until 40).forall(i => assign(i.toLong) == (i % 2).toLong))
    val cents = Similarity.kmeansCentroids(df, "vec_id", "embedding", 2, dims, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // centroid = mean of the micro-quantized members, exactly
    for (c <- 0 to 1; d <- 1 to dims) {
      val members = rows.filter(_._1 % 2 == c)
        .map(r => math.floor(r._2(d - 1).toDouble * 1e6))
      val want = members.sum / (1e6 * members.size)
      assert(cents((c.toLong, d)) == want, s"cent $c dim $d")
    }
  }
}
