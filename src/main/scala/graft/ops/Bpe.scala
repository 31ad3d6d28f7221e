package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-scale BPE merge-pair training (the public byte-pair-encoding
 * algorithm of Sennrich et al. 2016, "Neural Machine Translation of Rare
 * Words with Subword Units") — the tokenizer-training workload of an LLM
 * data pipeline, run as k merge rounds over the DISTINCT-WORD frequency
 * table (classic BPE trains on word counts, not the raw corpus, so the
 * working set is vocabulary-sized).
 *
 * Scale shape: one shuffle builds (word, count); each round is one
 * map-side-combinable pair-count aggregation over the word table plus a
 * 1-ROW collect of the winning pair (bounded driver model state — the
 * MLlib pattern, like the k-means trainer), and the merge itself applies
 * per word as a left-fold over the symbol array (a HOF projection — no
 * shuffle). Rounds are a fixed small count. At 100 TB the word table is
 * millions of rows, still thousands of times smaller than the corpus.
 *
 * Determinism: the winning pair orders by (count DESC, left ASC,
 * right ASC) — byte-lexicographic on ASCII in both engines. The greedy
 * left-to-right merge is the reference semantics: "aaa" under pair (a,a)
 * becomes [aa, a], which the fold reproduces exactly (a freshly merged
 * symbol never re-merges with the following one inside the same round).
 */
object Bpe {

  /** k learned merges: (step, merge_left, merge_right, pair_count). */
  def train(df: DataFrame, textCol: String, k: Int): DataFrame =
    trainImpl(df, textCol, k)._1

  /** The ENCODE side: per distinct word, its segmentation after the k
    * learned merges — (word, tokens '|'-joined, n_tokens). At corpus scale
    * the trained merge list is a bounded broadcastable model and encoding
    * is a stateless projection over documents; here the distinct-word
    * table IS the checkable unit. */
  def segment(df: DataFrame, textCol: String, k: Int): DataFrame =
    // the returned plan embeds the k winning pairs as literals (training
    // collected them already), so it is a plain deterministic lineage —
    // one word-table shuffle + k fold projections, no cache dependency
    trainImpl(df, textCol, k)._2.select(col("w").as("word"),
      array_join(col("sym"), "|").as("tokens"),
      size(col("sym")).as("n_tokens"))

  /** Corpus-scale ENCODE: per-document token counts under the trained
    * tokenizer. The (word → n_tokens) map is vocabulary-sized — a
    * broadcast-join model, exactly how a production tokenizer pass runs:
    * the corpus is touched once, streaming, with no corpus-sized shuffle
    * (the groupBy key is doc_id, partial-aggregated map-side). */
  def docTokens(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val seg = segment(df, textCol, k).select(col("word"), col("n_tokens"))
    df.select(col(idCol).cast("long").as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(seg), "word")
      .groupBy("doc_id")
      .agg(sum("n_tokens").as("n_tokens"), count(lit(1)).as("n_words"))
  }

  /** Tokenizer vocabulary-coverage evaluation: train the merges on the
    * `trainPred` slice only, then encode the HELD-OUT slice — per doc,
    * the word count, the out-of-vocabulary word count (words never seen
    * in training have no segmentation; a production tokenizer falls back
    * to byte/char pieces, so their token cost is the word's char length),
    * the resulting token count, and the OOV rate. The eval that sizes a
    * vocabulary against a shifting corpus.
    *
    * Scale shape: the trained (word → n_tokens) map is vocabulary-sized
    * (broadcast model); the held-out corpus is touched once with a
    * map-side-combinable per-doc aggregation — [[docTokens]]' shape plus
    * a left join instead of inner. */
  def oovReport(df: DataFrame, idCol: String, textCol: String, k: Int,
                trainPred: org.apache.spark.sql.Column): DataFrame = {
    val seg = segment(df.filter(trainPred), textCol, k)
      .select(col("word"), col("n_tokens"))
    df.filter(!trainPred)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(seg), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("n_tokens").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("n_tokens").cast("long"), length(col("word")).cast("long")))
          .as("n_tokens"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_words"), 9))
  }

  // shared bounded-LRU memo ([[BoundedMemo]], same as kmeansLoop): the
  // three registered queries share one training run per (input plan,
  // params); nothing to release on evict — trainLoop unpersists eagerly
  private val memo =
    new BoundedMemo[(Int, Any, String), (DataFrame, DataFrame)](8)(_ => ())

  private def trainImpl(df: DataFrame, textCol: String, k: Int): (DataFrame, DataFrame) = {
    val key = (df.sparkSession.hashCode(),
      df.queryExecution.analyzed.canonicalized, s"$textCol|$k")
    memo.getOrCompute(key, trainLoop(df, textCol, k))
  }

  private def trainLoop(df: DataFrame, textCol: String, k: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._

    // distinct-word frequency table, symbols = characters
    // literal single-space split — matching the DuckDB oracle and the
    // repo's text-op convention (regex \s+ would diverge on tabs/newlines)
    // Lazy checkpoints (r18): each step's word table materializes inside
    // the NEXT step's pair-count job instead of paying a dedicated
    // persist+count job per merge step (2k jobs -> k+1), and the
    // truncated lineage keeps per-step planning flat. Checkpoint blocks
    // are reclaimed by the ContextCleaner when the superseded table goes
    // out of scope (explicitly unpersisting a localCheckpoint would lose
    // the only copy — lineage is truncated).
    var words = df
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("sym", split(col("w"), ""))
      .localCheckpoint(eager = false)

    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (step <- 1 to k) {
      // adjacent symbol pairs weighted by word frequency — partial
      // aggregation collapses each partition before the (tiny) shuffle
      // sequence(1, size) then drop the final null-right pair: Spark's
      // sequence(1, 0) is a DESCENDING [1, 0] for fully-merged 1-symbol
      // words, so the off-the-end form with try_element_at is the safe one
      val best = words
        .select(col("cnt"), explode(expr(
          "filter(transform(sequence(1, size(sym)), " +
            "j -> struct(element_at(sym, j) AS l, try_element_at(sym, j + 1) AS r)), " +
            "p -> p.r IS NOT NULL)")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty)
        return (merges.toSeq.toDF("step", "merge_left", "merge_right", "pair_count"), words)
      val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((step, l, r, c))

      // greedy left-to-right merge as a left fold over each word's symbols
      val lLit = lit(l); val rLit = lit(r); val m = lit(l + r)
      words = words.withColumn("sym",
        aggregate(col("sym"),
          array().cast("array<string>"),
          (acc: Column, x: Column) =>
            when(size(acc) > 0 &&
                 element_at(acc, -1) === lLit && x === rLit,
              concat(slice(acc, lit(1), size(acc) - 1), array(m)))
              .otherwise(concat(acc, array(x)))))
        .localCheckpoint(eager = false)
    }
    (merges.toSeq.toDF("step", "merge_left", "merge_right", "pair_count"), words)
  }
}
