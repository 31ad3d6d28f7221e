package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Table profile: exact n/null/distinct per column, all-null columns
  * degrade to zero distinct instead of vanishing from the report. */
class ProfileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("exact counts, nulls, and min/max per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Option.empty[String]),
      (2L, Some("b"), Option.empty[String]),
      (3L, Some("a"), Option.empty[String]),
      (4L, Option.empty[String], Option.empty[String]))
      .toDF("id", "s", "dead")
    val got = Profile.tableProfile(df, Seq("id", "s", "dead"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(5)), Option(r.getString(6))))).toMap
    assert(got("id") == ((4L, 0L, 4L, Some("1"), Some("4"))))
    assert(got("s") == ((4L, 1L, 2L, Some("a"), Some("b"))))
    assert(got("dead") == ((4L, 4L, 0L, None, None)))
    // HLL estimate should be close to truth at tiny cardinalities
    val est = Profile.tableProfile(df, Seq("id", "s", "dead"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(est("id") - 4.0) < 0.5 && est("dead") == 0.0)
  }
}
