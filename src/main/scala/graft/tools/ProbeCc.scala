package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the connected-components loop (dev tool). */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $l%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = time("simhash pairs build") {
      val p = graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", "source", 16, 2)
      println("[cc] pairs=" + p.count()); p
    }
    val cc = time("cc total") {
      graft.ops.Dedup.connectedComponents(pairs, docs, "doc_id")
    }
    time("final count")(println("[cc] rows=" + cc.count()))

    // replicate the loop with per-stage timing
    val edges = pairs
    val sym = time("sym checkpoint") {
      edges.select(col("id_a").cast("long").as("__src"),
          col("id_b").cast("long").as("__dst"))
        .union(edges.select(col("id_b").cast("long").as("__src"),
          col("id_a").cast("long").as("__dst")))
        .localCheckpoint()
    }
    var comp = time("init checkpoint") {
      docs.select(col("doc_id").cast("long").as("__nid"),
        col("doc_id").cast("long").as("__c")).localCheckpoint()
    }
    var prevSum = time("init sum")(comp.agg(sum("__c")).head().getLong(0))
    var done = false
    var it = 0
    while (it < 25 && !done) {
      val nbrMin = sym.join(comp, sym("__dst") === comp("__nid"))
        .groupBy(col("__src")).agg(min("__c").as("__nc"))
      val stepped = comp.join(nbrMin, comp("__nid") === nbrMin("__src"), "left")
        .select(col("__nid"),
          least(col("__c"), coalesce(col("__nc"), col("__c"))).as("__c"))
      val next = time(s"round $it checkpoint") {
        stepped.as("l")
          .join(stepped.select(col("__nid").as("__jid"), col("__c").as("__jc")),
            col("l.__c") === col("__jid"))
          .select(col("l.__nid").as("__nid"),
            least(col("l.__c"), col("__jc")).as("__c"))
          .localCheckpoint()
      }
      val s = time(s"round $it sum")(next.agg(sum("__c")).head().getLong(0))
      comp.unpersist()
      comp = next
      done = s == prevSum
      prevSum = s
      it += 1
    }
    println(s"[cc] iterations=$it")
    spark.stop()
  }
}
