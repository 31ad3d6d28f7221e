package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators for scan locality — the write-side optimization
 * that matters most at 100 TB: co-locating rows that are queried together
 * so file/row-group skipping prunes most of the table.
 *
 * Z-ordering (Morton order) interleaves the bits of several quantized
 * dimensions into one sort key; range-partitioning and sorting by that key
 * gives every file a tight bounding box in EVERY dimension, so min/max
 * statistics prune multi-predicate queries (`user = u AND ts BETWEEN …`)
 * that a single-column sort can only prune on its leading column — the
 * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
 *
 * Everything is exact integer arithmetic over codegen'd bit operators:
 * dimension scaling is a linear map of (v − min) onto 0..2ᵇ−1 using the
 * true min/max from a 1-row aggregate (broadcast by construction), and the
 * interleave is a fixed fold of shift/and/or terms — bit-identical on any
 * engine, no UDF, no sort needed to COMPUTE the key (sorting by it is the
 * writer's choice).
 */
object Layout {

  /** Quantize `v` into 0..2^bits−1 given inclusive min/max columns (the
    * degenerate max==min case maps to 0). The scale runs in double —
    * (v−min)·(2ᵇ−1) overflows BIGINT for nanosecond-epoch spans — with an
    * explicit floor (Spark truncates double→long, DuckDB rounds: floor
    * first makes both engines agree) and a clamp for the max value's
    * possible upward rounding. Same IEEE ops in the same order on both
    * engines ⇒ bit-identical cells. */
  private def scaled(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val m = ((1L << bits) - 1).toDouble
    val span = (hi - lo).cast("double")
    when(hi === lo, lit(0L))
      .otherwise(least(
        floor((v - lo).cast("double") * lit(m) / span).cast("long"),
        lit((1L << bits) - 1)))
  }

  /** Morton interleave of two already-quantized b-bit values: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. A fixed fold of 2b
    * shift/and/or terms — whole-stage codegen keeps this one projection. */
  def interleave2(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /**
   * Z-value + target-bucket assignment for a two-dimension layout:
   * quantize both dimensions to `bits` bits against their true min/max
   * (one tiny aggregate, broadcast), interleave into a 2·bits-bit Morton
   * key, and take the top `log2(nBuckets)` bits as the file/bucket id.
   *
   * Returns the input's id column plus (zvalue, bucket). Writing
   * `repartitionByRange(col("zvalue"))`-sorted output is the caller's
   * final step — this operator computes the key, it does not shuffle.
   */
  /**
   * Write `df` parquet Z-ordered on two dimensions: compute the Morton key
   * ([[zorder2]] math inline, all columns kept), range-partition into
   * `nFiles` partitions by the key, sort within each, and write — every
   * output file then has a tight min/max bounding box in BOTH dimensions,
   * so footer statistics prune multi-predicate scans (the OPTIMIZE
   * ZORDER write path; LayoutSpec verifies per-file spans on read-back).
   * One range exchange; no global sort.
   */
  def writeZOrdered(df: DataFrame, dim1: Column, dim2: Column,
                    path: String, bits: Int = 16, nFiles: Int = 8): Unit = {
    val d1 = dim1.cast("long")
    val d2 = dim2.cast("long")
    val bounds = df.agg(
      min(d1).as("__lo1"), max(d1).as("__hi1"),
      min(d2).as("__lo2"), max(d2).as("__hi2"))
    df.crossJoin(bounds)
      .withColumn("__z", interleave2(
        scaled(d1, col("__lo1"), col("__hi1"), bits),
        scaled(d2, col("__lo2"), col("__hi2"), bits), bits))
      .drop("__lo1", "__hi1", "__lo2", "__hi2")
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Hilbert-curve index of an already-quantized (x, y) pair — the
   * better-locality alternative to Morton order: consecutive curve
   * positions are ALWAYS grid-adjacent (proven exhaustively in
   * LayoutSpec), so range-partitioning by `d` gives files whose bounding
   * boxes are typically ~2× tighter than Z-order's at the same file
   * count. The standard per-level rotate-and-accumulate iteration
   * (Hamilton's xy2d) unrolls into `bits` chained projections over NAMED
   * intermediate columns — naming each level keeps the Catalyst tree
   * linear in `bits` (a pure expression fold would grow exponentially,
   * since every level references the previous x and y more than once).
   * Appends `outCol` (the curve position); drops the intermediates.
   */
  def hilbert2(df: DataFrame, xCol: String, yCol: String, bits: Int,
               outCol: String): DataFrame = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    var cur = df.withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn("__hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = when((col("__hx").bitwiseAND(lit(s))) > 0, 1L).otherwise(0L)
      val ry = when((col("__hy").bitwiseAND(lit(s))) > 0, 1L).otherwise(0L)
      cur = cur
        .withColumn("__rx", rx).withColumn("__ry", ry)
        .withColumn("__hd", col("__hd") +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // rotate the quadrant: ry=0 swaps x/y, rx=1 also flips both over
        // the FULL grid (n−1, not s−1 — the canonical xy2d iteration)
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit((1L << bits) - 1) - col("__hy"))
              .otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit((1L << bits) - 1) - col("__hx"))
              .otherwise(col("__hx")))
            .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx")).withColumn("__hy", col("__ny"))
        .drop("__nx", "__ny", "__rx", "__ry")
    }
    cur.withColumn(outCol, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  def zorder2(df: DataFrame, idCol: String, dim1: Column, dim2: Column,
              bits: Int, nBuckets: Int): DataFrame = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of two")
    val bucketBits = 63 - java.lang.Long.numberOfLeadingZeros(nBuckets.toLong)
    val d1 = dim1.cast("long").as("__d1")
    val d2 = dim2.cast("long").as("__d2")
    val withDims = df.select(col(idCol), d1, d2)
    val bounds = withDims.agg(
      min("__d1").as("__lo1"), max("__d1").as("__hi1"),
      min("__d2").as("__lo2"), max("__d2").as("__hi2"))
    withDims.crossJoin(bounds) // 1-row bounds: broadcast by construction
      .withColumn("zvalue", interleave2(
        scaled(col("__d1"), col("__lo1"), col("__hi1"), bits),
        scaled(col("__d2"), col("__lo2"), col("__hi2"), bits), bits))
      .withColumn("bucket",
        shiftright(col("zvalue"), 2 * bits - bucketBits).cast("int"))
      .select(col(idCol), col("zvalue"), col("bucket"))
  }
}
