package graft.queries

import graft.kernels.SonarRegrid
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sonar polar→cartesian regrid as a registered query (stglib/son/nc2xy.py:
 * 60-123). Not SQL-expressible (bilinear interpolation over a rotated fan) —
 * rows-only for the driver; value correctness is covered by
 * SonarRegridSpec's radial-ramp and compass-orientation goldens.
 *
 * Scans synthesize from events: one fan per user_id, sweep/range indices
 * from a per-user (partitioned) row_number, intensity from `value`. The
 * kernel runs once per scan inside mapPartitions after an AQE-exempt
 * repartition on the scan key — the same bounded-state fan-out as
 * Spectra.perGroup (the reference loops scans on the driver).
 */
object SonarQueries {
  private val NSWEEP = 12  // 30-deg sweep lines
  private val NRANGE = 4   // 0.5 m range cells: 0.5..2.0 m
  private val TOTAL_RANGE = 2.0
  private val DXY = 0.5

  def qs: Seq[Q] = Seq(
    Q("sonar_regrid",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val grid = Tables.events(s, dir)
          .withColumn("rn", row_number().over(w) - 1)
          .withColumn("sweep", expr(s"rn div $NRANGE"))
          .withColumn("rcell", col("rn") % NRANGE)
          .filter(col("sweep") < NSWEEP)
          .withColumn("nb", count(lit(1)).over(Window.partitionBy("user_id")))
          .filter(col("nb") >= NSWEEP * NRANGE) // full fans only
          .select(col("user_id").cast("long").as("_1"),
            col("rn").cast("long").as("_2"), col("value").cast("double").as("_3"))
          .as[(Long, Long, Double)]
        val n = s.sparkContext.defaultParallelism
        // lit(0) keeps the AQE-exempt exchange from being statically elided
        // (see Spectra.perGroup) — without it the scan-key window upstream
        // satisfies the partitioning and AQE serializes the kernel
        val out = grid.repartition(n, col("_1"), lit(0))
          .sortWithinPartitions("_1", "_2")
          .mapPartitions { it =>
            val b = it.buffered
            new Iterator[(Long, Array[Double])] {
              def hasNext: Boolean = b.hasNext
              def next(): (Long, Array[Double]) = {
                val k = b.head._1
                val buf = scala.collection.mutable.ArrayBuffer.empty[Double]
                while (b.hasNext && b.head._1 == k) buf += b.next()._3
                (k, buf.toArray)
              }
            }.flatMap { case (scan, vals) =>
              val thetas = Array.tabulate(NSWEEP)(i => i * 360.0 / NSWEEP)
              val ranges = Array.tabulate(NRANGE)(i => 0.5 + i * 0.5)
              val image = Array.tabulate(NSWEEP, NRANGE)((t, r) =>
                vals(t * NRANGE + r))
              val (axis, img) = SonarRegrid.regrid(
                thetas, ranges, image, TOTAL_RANGE, DXY)
              for {
                ix <- axis.indices.iterator
                iy <- axis.indices.iterator
              } yield (scan, ix, iy, axis(ix), axis(iy),
                if (img(ix)(iy).isNaN) None else Some(img(ix)(iy)))
            }
          }
        out.toDF("scan", "ix", "iy", "x", "y", "v")
      },
      None,
      note = "rows-only: bilinear fan regrid; goldens in SonarRegridSpec"))
}
