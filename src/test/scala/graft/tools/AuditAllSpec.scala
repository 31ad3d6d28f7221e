package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded regressions for the scale audit: the flags must actually trip
  * on the anti-patterns they claim to catch, and must stay quiet on the
  * legitimate bounded shapes they exempt. */
class AuditAllSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a forced broadcast of a data-sized side is flagged") {
    // the exact class removed from the abss/eofe chains: a per-key
    // aggregate of the data spine, force-broadcast back onto it. The
    // spine must NOT be a LocalRelation (driver-resident is bounded by
    // definition) — range() models a distributed scan.
    val data = spark.range(100)
      .select((col("id") % 10).as("k"), col("id").cast("double").as("v"))
    val perKey = data.groupBy("k").agg(avg("v").as("m"))
    val plan = data.join(broadcast(perKey), Seq("k"), "left")
    assert(AuditAll.flagsOf(plan).contains("FORCED-BROADCAST"))
  }

  test("a forced broadcast of a raw scan is flagged") {
    import spark.implicits._
    val a = spark.range(100).toDF("k")
    val b = spark.range(100).toDF("k")
    assert(AuditAll.flagsOf(a.join(broadcast(b), Seq("k")))
      .contains("FORCED-BROADCAST"))
  }

  test("bounded builds are NOT flagged: 1-row aggregate, local relation, " +
       "literal limit, grouped agg over a bounded child") {
    import spark.implicits._
    val data = spark.range(100)
      .select((col("id") % 10).as("k"), col("id").cast("double").as("v"))
    // groupless aggregate -> 1 row
    val tot = data.agg(sum("v").as("t"))
    assert(!AuditAll.flagsOf(data.crossJoin(broadcast(tot)))
      .contains("FORCED-BROADCAST"))
    // LocalRelation (driver-resident already)
    val dimLocal = Seq((0, "a"), (1, "b")).toDF("k", "name")
    assert(!AuditAll.flagsOf(data.join(broadcast(dimLocal), Seq("k")))
      .contains("FORCED-BROADCAST"))
    // literal limit
    val top = data.orderBy(col("v").desc).limit(5)
      .select(col("k").as("k"), col("v").as("topv"))
    assert(!AuditAll.flagsOf(data.join(broadcast(top), Seq("k")))
      .contains("FORCED-BROADCAST"))
    // grouped aggregate over a bounded (limited) child stays bounded
    val gOverBounded = data.limit(7).groupBy("k").agg(max("v").as("m"))
    assert(!AuditAll.flagsOf(data.join(broadcast(gOverBounded), Seq("k")))
      .contains("FORCED-BROADCAST"))
  }

  test("collect-site lint: unjustified driver actions trip, bounded and " +
       "allowlisted ones pass, stale allowlist entries are reported") {
    val dir = java.nio.file.Files.createTempDirectory("lint_src")
    def write(name: String, body: String): Unit = {
      val f = dir.resolve(name)
      java.nio.file.Files.createDirectories(f.getParent)
      java.nio.file.Files.write(f, body.getBytes)
    }
    write("ops/Bad.scala",
      """val rows = df.groupBy("user").agg(sum("v"))
        |  .collect()""".stripMargin)
    write("ops/Bounded.scala",
      """val a = df.limit(5).collect()
        |val b = df.agg(sum("v")).head()
        |val c = xs.take(3) // plain Scala, no Dataset action parens""".stripMargin)
    write("ops/Justified.scala",
      """val m = trainedModel.collect() // vocab-bounded""".stripMargin)
    // unjustified grouped collect -> 1; plus one stale entry -> 2
    val n = AuditAll.auditCollectSites(dir.toString, Seq(
      ("ops/Justified.scala", "trainedModel.collect()", "vocab-bounded model"),
      ("ops/Ghost.scala", "nothing matches this", "stale entry")))
    assert(n == 2)
    // with only live, matching entries the bad file alone is flagged
    val n2 = AuditAll.auditCollectSites(dir.toString, Seq(
      ("ops/Justified.scala", "trainedModel.collect()", "vocab-bounded model")))
    assert(n2 == 1)
  }

  test("the repo's own collect-site lint is clean at HEAD") {
    assert(AuditAll.auditCollectSites() == 0)
  }

  test("an unhinted equi-join is not flagged even when the planner " +
       "broadcasts it by size") {
    val data = spark.range(100)
      .select((col("id") % 10).as("k"), col("id").cast("double").as("v"))
    val perKey = data.groupBy("k").agg(avg("v").as("m"))
    // same shape as the first test WITHOUT the hint: AQE/statistics may
    // broadcast it at this size, which is fine — only FORCING is the bug
    assert(!AuditAll.flagsOf(data.join(perKey, Seq("k"), "left"))
      .contains("FORCED-BROADCAST"))
  }
}
