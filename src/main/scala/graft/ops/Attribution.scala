package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Markov-chain attribution with removal effects (Anderl et al. 2014) —
 * the model-based third leg next to last-touch and linear: user journeys
 * become a first-order Markov chain over touch channels with absorbing
 * CONV/NULL states; a channel's credit is its REMOVAL EFFECT, the
 * relative drop in START→CONV absorption probability when journeys
 * entering that channel die instead.
 *
 * Journey semantics: per user, all events strictly before the FIRST
 * conversion event are touches (in (ts, event_id) order); the journey
 * absorbs into CONV if the user converted, else into NULL. START opens
 * every journey (a user whose first event is the conversion contributes
 * START→CONV directly).
 *
 * Exactness + scale: transition counts are one distributed
 * window-lag + aggregation pass (shuffle on the user key). The chain
 * itself is MODEL-sized — (channels+1)² transition rows — so absorption
 * probabilities run driver-side as FIXED-POINT INTEGER iterations in
 * millionths (v ← (cnt_CONV·10⁶ + Σ cnt·v') div total, `iters` rounds),
 * the PageRank integer discipline: both engines replay the identical
 * integer sequence, making removal effects oracle-exact. Collecting the
 * transition matrix is a bounded model collect (the MMR/bloom-words
 * precedent), not a data collect.
 *
 * Output: (channel, n_visits, base_conv, removed_conv, removal_effect,
 * attribution) — attribution = effect normalized over channels.
 */
object Attribution {

  /** `channelFilter`: restrict removal scenarios (and credit
    * normalization) to a FIXED business channel list — unknown event
    * types still shape the chain's transitions, they just earn no
    * credit row. None = every observed non-absorbing state. */
  def markovRemoval(ev: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, idCol: String, convType: String,
                    iters: Int = 12,
                    channelFilter: Option[Seq[String]] = None): DataFrame = {
    val spark = ev.sparkSession
    val byUser = Window.partitionBy("__u")
    val seq = Window.partitionBy("__u").orderBy("__ts", "__id")
    val base = ev.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"), col(idCol).as("__id"))
    // packed position of the first conversion per user (max key sentinel
    // when none) — one window pass, no join
    val packed = base
      .withColumn("__pos", row_number().over(seq))
      .withColumn("__cpos", min(when(col("__t") === convType, col("__pos")))
        .over(byUser))
    val touches = packed
      .filter(coalesce(col("__cpos"), lit(Int.MaxValue)) > col("__pos") &&
        col("__t") =!= convType)
      .withColumn("__next", lead(col("__t"), 1).over(seq))
      .withColumn("__first", col("__pos") === min(col("__pos")).over(byUser))
      .withColumn("__to", coalesce(col("__next"),
        when(col("__cpos").isNotNull, lit("CONV")).otherwise(lit("NULL"))))
    val starts = packed.filter(col("__pos") === 1)
      .select(lit("START").as("__from"),
        when(col("__t") === convType, lit("CONV")).otherwise(col("__t"))
          .as("__to"))
    val trans = touches.select(col("__t").as("__from"), col("__to"))
      .unionByName(starts)
      .groupBy("__from", "__to").agg(count(lit(1)).as("__c"))
    // ---- bounded model collect: (channels+1)^2 rows ----
    val rows = trans.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val states = rows.map(_._1).distinct.sorted // transient states incl. START
    val tot = states.map(s => s -> rows.filter(_._1 == s).map(_._3).sum).toMap
    val cnt = rows.map { case (f, t, c) => (f, t) -> c }.toMap
    def absorb(removed: Option[String]): Map[String, Long] = {
      var v = states.map(_ -> 0L).toMap
      for (_ <- 1 to iters) {
        v = states.map { s =>
          s -> (if (removed.contains(s)) 0L
          else {
            val num = cnt.getOrElse((s, "CONV"), 0L) * 1000000L +
              states.map(s2 => cnt.getOrElse((s, s2), 0L) * v(s2)).sum
            num / tot(s)
          })
        }.toMap
      }
      v
    }
    import spark.implicits._
    // a FIXED channel list emits a row for every requested channel, even
    // one never observed as a from-state (n_visits NULL, removal a no-op
    // so effect 0) — matching the oracle's per-channel scalar subqueries
    if (rows.isEmpty) {
      return channelFilter.getOrElse(Nil).distinct.sorted
        .map(c => (c, None: Option[Long], None: Option[Long],
          None: Option[Long]))
        .toDF("channel", "n_visits", "__b", "__r")
        .select(col("channel"), col("n_visits"),
          round(col("__b") / 1e6, 9).as("base_conv"),
          round(col("__r") / 1e6, 9).as("removed_conv"),
          lit(null).cast("double").as("removal_effect"),
          lit(null).cast("double").as("attribution"))
    }
    val baseConv = absorb(None)("START")
    val observed = states.filterNot(_ == "START")
    val channels = channelFilter.map(_.distinct.sorted).getOrElse(observed.toSeq)
    val out = channels.map { c =>
      val rm = if (states.contains(c)) absorb(Some(c))("START") else baseConv
      (c, tot.get(c), Some(baseConv): Option[Long], Some(rm): Option[Long])
    }
    val effSum = out.map { case (_, _, b, r) => b.get - r.get }.sum.toDouble
    out.toSeq.toDF("channel", "n_visits", "__b", "__r")
      .select(col("channel"), col("n_visits"),
        round(col("__b") / 1e6, 9).as("base_conv"),
        round(col("__r") / 1e6, 9).as("removed_conv"),
        // try_divide: a chain with zero base absorption (no conversions at
        // all) or zero total effect divides by 0 — NULL, the oracle's x/0
        round(try_divide((col("__b") - col("__r")).cast("double"),
          col("__b")), 9).as("removal_effect"),
        round(try_divide((col("__b") - col("__r")).cast("double"),
          lit(effSum)), 9).as("attribution"))
      .orderBy("channel")
  }
}
