package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Probabilistic sketches for 100 TB-scale analytics: HyperLogLog distinct
 * counting and Count-Min frequency estimation. Unlike Spark's built-in
 * `approx_count_distinct` (whose HLL++ registers are engine-private),
 * these sketches are built from deterministic md5/integer arithmetic so
 * any SQL engine reproduces them bit-identically — the estimates are
 * exactly oracle-checkable, and a sketch built on one system can be
 * merged/queried on another (registers are plain (bucket, value) rows).
 *
 * Scale shape: both sketches reduce unbounded input to bounded state
 * (m registers / d×w counters) via map-side-combinable aggregations —
 * the canonical "one pass, tiny state" layout for distributed cardinality
 * and heavy-hitter work.
 */
object Sketches {

  /** HLL precision: 2^10 registers. */
  val HllP = 10
  val HllM: Int = 1 << HllP
  /** Bits left for the rho scan after the bucket index (60-bit hash). */
  val HllRestBits = 50
  /** Standard bias constant alpha_m for m = 1024. */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)

  /** 60-bit positive hash of a column's string form (15 hex chars of md5)
    * — portable to any engine with md5 + string ops. */
  def hash60(c: Column): Column =
    // codegen kernel — value-identical to the SQL form
    // CAST(conv(substring(md5(CAST(c AS STRING)), 1, 15), 16, 10) AS BIGINT)
    // (Md5PrefixSpec), without the hex-string materialization + conv
    // re-parse + per-row MessageDigest allocation (r17: md5-prefix hashing
    // is the per-row floor of bootstrap_ci, the sketch family and the
    // fingerprints)
    graft.functions.Md5Prefix.md5PrefixLong(c.cast("string"), 15)

  /** Same 60-bit hash built from Column functions (no SQL-string round-trip)
    * — safe for composite inputs (CASE WHEN, concat, …) whose `toString`
    * isn't guaranteed to re-parse as SQL. */
  def hash60c(c: Column): Column =
    graft.functions.Md5Prefix.md5PrefixLong(c.cast("string"), 15)

  /**
   * HyperLogLog distinct-count estimate per group (Flajolet et al. 2007):
   * bucket = low p bits, rho = LSB-scan of the remaining bits (computed as
   * `bit_count((rest & -rest) - 1) + 1` — pure integer, no float), one
   * max-per-register aggregation, then the harmonic estimate with the
   * small-range linear-counting correction.
   *
   * Exactness discipline: the harmonic sum Σ 2^(-M_j) is accumulated as
   * the INTEGER Σ 2^(maxRho - M_j) (empty registers contribute
   * 2^maxRho each), so the only float ops are one division and one ln —
   * deterministic across engines regardless of register order.
   *
   * Returns (group, n_true, n_empty, est_raw, est) — n_true is the exact
   * distinct count for accuracy inspection; `est` applies the
   * linear-counting branch below 2.5·m.
   */
  def hllDistinct(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, keyCol), groupCol)

  /** (group, key) pre-aliasing — done BEFORE any other op so
    * groupCol == keyCol (distinct-count keyed by the value itself) stays
    * unambiguous. */
  private def keyed(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.select(col(groupCol).as("__g"), col(keyCol).as("__k"))

  /** The per-key (group, bucket, rho) projection shared by the batch and
    * streaming register builders; expects __g/__k columns. */
  private def hllProject(df: DataFrame): DataFrame = {
    val maxRho = HllRestBits + 1 // rho when the rest bits are all zero
    df
      .withColumn("__h", hash60(col("__k")))
      .withColumn("__b", pmod(col("__h"), lit(HllM.toLong)))
      .withColumn("__rest", expr(s"__h div $HllM"))
      .withColumn("__rho",
        when(col("__rest") === 0, lit(maxRho))
          .otherwise(expr("bit_count((__rest & -__rest) - 1) + 1")))
      .select(col("__g"), col("__b"), col("__rho"))
  }

  /** Build the register table (group, __b, __m, __nk): bucket, max rho,
    * and the exact per-register distinct-key count (__nk sums to the true
    * distinct count for a single build; it is NOT merge-invariant —
    * that's the whole reason the sketch exists). Registers are plain rows:
    * shard-local builds merge with [[hllMerge]]. */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    hllProject(keyed(df, groupCol, keyCol).distinct())
      .groupBy(col("__g"), col("__b"))
      .agg(max("__rho").as("__m"), count(lit(1)).as("__nk"))

  /** Streaming register builder: the same projection + max aggregation,
    * runnable under Structured Streaming in complete/update mode with
    * bounded state (≤ m registers per group — duplicates collapse into
    * max() so no distinct pass is needed; __nk is omitted because exact
    * distinct counting is precisely what unbounded state would cost).
    * [[hllEstimate]] and [[hllMerge]] both accept the nk-less shape. */
  def hllRegistersStream(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    hllProject(keyed(df, groupCol, keyCol))
      .groupBy(col("__g"), col("__b"))
      .agg(max("__rho").as("__m"))

  /** 0-filled __nk for register tables from the streaming builder, so the
    * whole register family composes. */
  private def withNk(regs: DataFrame): DataFrame =
    if (regs.columns.contains("__nk")) regs
    else regs.withColumn("__nk", lit(0L))

  /** Merge shard-local register tables: max per (group, bucket) — the
    * estimate over merged registers equals the estimate over the union of
    * the shards' inputs (per-register nk degrades to an upper bound; a
    * streamed side contributes 0). */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    withNk(a).unionByName(withNk(b)).groupBy(col("__g"), col("__b"))
      .agg(max("__m").as("__m"), sum("__nk").as("__nk"))

  /** Harmonic estimate from a register table (see [[hllDistinct]]). */
  def hllEstimate(regs0: DataFrame, groupCol: String): DataFrame = {
    val regs = withNk(regs0) // accept the streaming builder's nk-less shape
    val maxRho = HllRestBits + 1
    // integer harmonic numerator: Σ 2^(maxRho − M_j) over occupied
    // registers; empty registers add 2^maxRho each (exact, order-free)
    val grouped = regs.groupBy(col("__g"))
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - __m)")).as("__s"),
        count(lit(1)).as("__v"),
        sum("__nk").as("n_true"))
    val scale = lit(math.pow(2.0, maxRho)) // 2^51, exact dyadic
    val sFull = (col("__s") +
      (lit(HllM.toLong) - col("__v")) * lit(1L << maxRho)).cast("double")
    val estRaw = lit(HllAlpha * HllM * HllM) * scale / sFull
    val nEmpty = lit(HllM.toLong) - col("__v")
    val estLc = lit(HllM.toDouble) * log(lit(HllM.toDouble) / nEmpty.cast("double"))
    grouped.select(col("__g").as(groupCol),
      col("n_true"),
      nEmpty.as("n_empty"),
      round(estRaw, 9).as("est_raw"),
      round(when(estRaw <= lit(2.5 * HllM) && nEmpty > 0, estLc)
        .otherwise(estRaw), 9).as("est"))
  }

  /** KMV sketch size (bottom-k minimum hash values kept per group). */
  val KmvK = 64
  /** hash60's range: hashes are uniform in [0, 2^60). */
  val KmvRange: Double = math.pow(2.0, 60)

  /**
   * KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002; Beyer et al.
   * 2007): keep the k smallest 60-bit hashes of the group's distinct keys;
   * est = (k−1) · R / h_(k) where R is the hash range. Unlike HLL the
   * sketch supports set operations (union = bottom-k of the register
   * union, and Jaccard estimation — see [[kmvJaccard]]); like the HLL here,
   * every intermediate is integer so both engines agree bit-exactly and
   * the estimate is oracle-checkable.
   *
   * Scale shape: bottom-k is computed in two bounded window passes —
   * per (group, salt) then per group — the distributed TakeOrdered layout;
   * no group ever sorts more than its salt-partition's k survivors.
   */
  def kmvRegisters(df: DataFrame, groupCol: String, keyCol: String,
                   k: Int = KmvK): DataFrame =
    kmvRegistersFrom(kmvHashes(df, groupCol, keyCol), k)

  /** The distinct (__g, __h) hash relation both the registers and the
    * exact-truth branches read — build it ONCE (and [[graft.ops.Spread.shared]]
    * it) when a query needs both. */
  private def kmvHashes(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    keyed(df, groupCol, keyCol).distinct()
      .select(col("__g"), hash60(col("__k")).as("__h")).distinct()

  private def kmvRegistersFrom(hashed: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pre = Window.partitionBy(col("__g"), pmod(col("__h"), lit(32L)))
      .orderBy(col("__h"))
    val fin = Window.partitionBy(col("__g")).orderBy(col("__h"))
    hashed
      .withColumn("__rn", row_number().over(pre)).filter(col("__rn") <= k)
      .withColumn("__rn", row_number().over(fin)).filter(col("__rn") <= k)
      .select(col("__g"), col("__h"))
  }

  /** Merge shard-local KMV register tables: bottom-k of the union — any
    * hash among the k smallest of A∪B is among the k smallest of its own
    * side, so merging sketches loses nothing vs sketching the union. */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int = KmvK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fin = Window.partitionBy(col("__g")).orderBy(col("__h"))
    a.unionByName(b).distinct()
      .withColumn("__rn", row_number().over(fin)).filter(col("__rn") <= k)
      .select(col("__g"), col("__h"))
  }

  /** Estimate from a KMV register table: exact count when the group has
    * fewer than k distinct hashes, else (k−1)·R/h_(k). Returns
    * (group, n_kept, kth_hash, est). */
  def kmvEstimate(regs: DataFrame, groupCol: String, k: Int = KmvK): DataFrame =
    regs.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_kept"), max("__h").as("kth_hash"))
      .select(col("__g").as(groupCol), col("n_kept"), col("kth_hash"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(KmvRange) /
            col("kth_hash").cast("double")), 9).as("est"))

  /** KMV distinct-count per group with the exact count alongside. */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int = KmvK): DataFrame = {
    // one shared hash relation: the truth count and the register windows
    // would otherwise EACH re-run the upstream keying (for the registered
    // trigram queries that is the tokenize+explode scan — the dominant cost)
    val hashes = Spread.shared(kmvHashes(df, groupCol, keyCol))
    val nTrue = hashes.groupBy(col("__g")).agg(count(lit(1)).as("n_true"))
    kmvEstimate(kmvRegistersFrom(hashes, k), groupCol, k)
      .join(nTrue.withColumnRenamed("__g", groupCol), groupCol)
      .select(col(groupCol), col("n_true"), col("n_kept"), col("kth_hash"),
        col("est"))
  }

  /**
   * Pairwise Jaccard estimation from KMV sketches (Beyer et al. 2007):
   * for each group pair (a < b), form the union sketch K = bottom-k of
   * K(a) ∪ K(b) and estimate J ≈ |{h ∈ K : h ∈ K(a) ∧ h ∈ K(b)}| / |K|.
   * The exact hash-set Jaccard rides along, so the estimator's quality is
   * oracle-visible. Everything flows from the bounded register tables —
   * the pair work is k-bounded per pair, never corpus-bounded.
   *
   * Returns (source_a, source_b, est_union, est_jaccard, true_jaccard).
   */
  def kmvJaccard(df: DataFrame, groupCol: String, keyCol: String,
                 k: Int = KmvK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashes = Spread.shared(kmvHashes(df, groupCol, keyCol))
    val regs = Spread.shared(kmvRegistersFrom(hashes, k))
    val gs = regs.select(col("__g")).distinct()
    val pairs = gs.select(col("__g").as("ga"))
      .crossJoin(gs.select(col("__g").as("gb")))
      .filter(col("ga") < col("gb"))
    // union sketch per pair: K(a) ∪ K(b) rows tagged by side, bottom-k
    val sideA = pairs.join(regs, col("ga") === col("__g")).select(
      col("ga"), col("gb"), col("__h"))
    val sideB = pairs.join(regs, col("gb") === col("__g")).select(
      col("ga"), col("gb"), col("__h"))
    val fin = Window.partitionBy(col("ga"), col("gb")).orderBy(col("__h"))
    val unionK = sideA.unionByName(sideB).distinct()
      .withColumn("__rn", row_number().over(fin)).filter(col("__rn") <= k)
    val inA = regs.select(col("__g").as("ga"), col("__h"), lit(1).as("__ina"))
    val inB = regs.select(col("__g").as("gb"), col("__h"), lit(1).as("__inb"))
    val est = unionK
      .join(inA, Seq("ga", "__h"), "left").na.fill(0, Seq("__ina"))
      .join(inB, Seq("gb", "__h"), "left").na.fill(0, Seq("__inb"))
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("__nu"), max("__h").as("__kth"),
        sum(col("__ina") * col("__inb")).as("__nboth"))
    // exact hash-set Jaccard per pair (the truth side)
    val ha = hashes.select(col("__g").as("ga"), col("__h"))
    val hb = hashes.select(col("__g").as("gb"), col("__h"))
    val counts = hashes.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val inter = ha.join(hb, "__h").filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb")).agg(count(lit(1)).as("__ni"))
    val truth = pairs
      .join(counts.withColumnRenamed("__g", "ga").withColumnRenamed("__n", "__na"), "ga")
      .join(counts.withColumnRenamed("__g", "gb").withColumnRenamed("__n", "__nb"), "gb")
      .join(inter, Seq("ga", "gb"), "left").na.fill(0L, Seq("__ni"))
      .select(col("ga"), col("gb"),
        (col("__ni").cast("double") /
          (col("__na") + col("__nb") - col("__ni")).cast("double")).as("__tj"))
    est.join(truth, Seq("ga", "gb"))
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        round(when(col("__nu") < k, col("__nu").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(KmvRange) /
            col("__kth").cast("double")), 9).as("est_union"),
        round(col("__nboth").cast("double") / col("__nu").cast("double"), 9)
          .as("est_jaccard"),
        round(col("__tj"), 9).as("true_jaccard"))
  }

  /** Count-Min depth (hash functions) and width (counters per row). */
  val CmD = 4
  val CmW = 1024

  /** 32-bit md5 token key, shared by build and probe sides. */
  private[ops] def tokenKey(c: Column): Column =
    graft.functions.Md5Prefix.md5PrefixLong(c, 8)

  /** Shared (a·key + b) mod P mod width bucket hash for the Count-Min
    * counters and the Bloom bit positions. */
  private[ops] def bucketHash(key: Column, a: Long, b: Long, width: Int): Column =
    pmod(pmod(lit(a) * key + lit(b), lit(Dedup.P)), lit(width.toLong))

  /** Bloom filter geometry: 16384 bit positions packed into 63-bit words
    * (bit 63 is never used so the per-word sum of distinct powers stays
    * positive — DuckDB's sum() widens to HUGEINT, and a sign-bit word
    * would disagree with Spark's two's-complement Long). */
  val BloomBits = 16384
  val BloomK = 5
  private val BloomWordBits = 63

  /**
   * Bloom membership filter (Bloom 1970) over the corpus's distinct
   * tokens, probed for a fixed term list — the third canonical sketch
   * next to HLL (cardinality) and Count-Min (frequency). The filter is
   * built as distinct (word, 2^bit) rows summed per word (distinct powers
   * never carry, so the sum IS the bitwise OR — exact, order-free, and
   * identical in any SQL engine); probing ANDs the k extracted bits.
   *
   * Returns (term, maybe_present, truly_present) — the no-false-negative
   * guarantee (truly ⇒ maybe) is oracle-visible.
   */
  /**
   * EXACT audience overlap via bitmap indexes (the roaring-bitmap join
   * shape, flat-word form): each group's member set becomes (word, bitmap)
   * rows — word = id div 63, bitmap = OR of 2^(id mod 63) — 63-bit words keep
   * the sign bit clear (DuckDB range-checks 1<<63) — and pairwise
   * intersection is an equi-join on the word index + popcount of ANDed
   * words. Unlike KMV/HLL this is exact, and unlike count-distinct joins
   * the shuffle carries ONE row per 63 ids; the pair work is
   * groups² × shared-words, never ids².
   *
   * Engine-portable OR: within (group, word) each member contributes its
   * single-bit power once, so `sum(DISTINCT 2^bit)` IS the bitwise OR
   * (distinct powers add carry-free). Popcounts, counts, and the Jaccard division are the only
   * non-integer step (one division, round-9).
   *
   * Output: (group_a, group_b, n_a, n_b, n_common, jaccard) for
   * group_a < group_b.
   */
  def bitmapOverlap(df: DataFrame, groupCol: String,
                    keyCol: String): DataFrame = {
    val words = Spread.shared(df
      .select(col(groupCol).as("__g"),
        expr(s"CAST($keyCol AS BIGINT) div 63").as("__w"),
        expr(s"shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(pmod(CAST($keyCol AS BIGINT), 63) AS INT))").as("__bit"))
      .groupBy("__g", "__w")
      .agg(sum_distinct(col("__bit")).as("__bm")))
    val sizes = words.groupBy("__g")
      .agg(sum(bit_count(col("__bm")).cast("long")).as("__n"))
    val a = words.select(col("__g").as("group_a"), col("__w"),
      col("__bm").as("__ba"))
    val b = words.select(col("__g").as("group_b"), col("__w").as("__w2"),
      col("__bm").as("__bb"))
    a.join(b, col("__w") === col("__w2") && col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b")
      .agg(sum(bit_count(col("__ba").bitwiseAND(col("__bb"))).cast("long"))
        .as("n_common"))
      .join(sizes.select(col("__g").as("group_a"), col("__n").as("n_a")),
        "group_a")
      .join(sizes.select(col("__g").as("group_b"), col("__n").as("n_b")),
        "group_b")
      .filter(col("n_common") > 0)
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("n_common"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"), 9)
          .as("jaccard"))
  }

  def bloomProbe(df: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val params = Dedup.hashParams(BloomK)
    val toks = Spread.shared(
      df.select(explode(TextAnalysis.tokens(col(textCol))).as("__t")).distinct()
        .withColumn("__k", tokenKey(col("__t"))))
    val bits = params.map { case (_, a, b) =>
      toks.select(bucketHash(col("__k"), a, b, BloomBits).as("__p"))
    }.reduce(_ unionByName _)
      .select((col("__p") / BloomWordBits).cast("long").as("__w"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(__p % $BloomWordBits AS INT))").as("__v"))
      .distinct()
    val words = bits.groupBy("__w").agg(sum("__v").as("__word")) // = bitwise OR
    val probes = terms.toDF("term").withColumn("__k", tokenKey(col("term")))
    val probeBits = params.map { case (_, a, b) =>
      probes.select(col("term"), bucketHash(col("__k"), a, b, BloomBits).as("__p"))
    }.reduce(_ unionByName _)
      .select(col("term"),
        (col("__p") / BloomWordBits).cast("long").as("__w"),
        pmod(col("__p"), lit(BloomWordBits.toLong)).cast("int").as("__b"))
    val checked = probeBits
      .join(broadcast(words), Seq("__w"), "left")
      .na.fill(0L, Seq("__word"))
      .withColumn("__set", expr("CAST(shiftright(__word, __b) & 1 AS BIGINT)"))
      .groupBy("term").agg(min("__set").as("maybe_present"))
    val truth = toks.filter(col("__t").isin(terms: _*))
      .select(col("__t").as("term")).withColumn("__tp", lit(1L))
    checked.join(truth, Seq("term"), "left")
      .na.fill(0L, Seq("__tp"))
      .select(col("term"), col("maybe_present").cast("int").as("maybe_present"),
        col("__tp").cast("int").as("truly_present"))
  }

  /**
   * Count-Min sketch (Cormode & Muthukrishnan 2005) over corpus tokens,
   * probed for a fixed term list: build d×w integer counters (bounded
   * state, map-side combinable), estimate each probe term's frequency as
   * the minimum over its d counters, and emit the exact count alongside
   * (the sketch guarantee est ≥ true is then oracle-visible).
   *
   * Returns (term, est, true_cnt) for each probe term.
   */
  def countMinProbe(df: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val params = Dedup.hashParams(CmD)
    val toks = Spread.shared(
      df.select(explode(TextAnalysis.tokens(col(textCol))).as("__t"))
        .withColumn("__k", tokenKey(col("__t"))))
    // one counter table per hash row; union keeps it a single shuffle of
    // (i, bucket) pairs — output bounded at d·w rows
    val counters = params.map { case (i, a, b) =>
      toks.groupBy(bucketHash(col("__k"), a, b, CmW).as("__b"))
        .agg(count(lit(1)).as("__c"))
        .select(lit(i).as("__i"), col("__b"), col("__c"))
    }.reduce(_ unionByName _)
    val probes = terms.toDF("term")
      .withColumn("__k", tokenKey(col("term")))
    val probeBuckets = params.map { case (i, a, b) =>
      probes.select(col("term"), lit(i).as("__i"),
        bucketHash(col("__k"), a, b, CmW).as("__b"))
    }.reduce(_ unionByName _)
    val est = probeBuckets
      .join(broadcast(counters), Seq("__i", "__b"), "left")
      .na.fill(0L, Seq("__c"))
      .groupBy("term").agg(min("__c").as("est"))
    // truth side reuses the shared token relation and pre-filters to the
    // probe terms — a |terms|-bounded aggregate, not a corpus-wide one
    val truth = toks.filter(col("__t").isin(terms: _*))
      .groupBy("__t").agg(count(lit(1)).as("true_cnt"))
    est.join(truth, est("term") === truth("__t"), "left")
      .na.fill(0L, Seq("true_cnt"))
      .select(col("term"), col("est"), col("true_cnt"))
  }

  /** Histogram-quantile bin count (power of two so the bucket formula is a
    * shift-friendly integer division). */
  val HistBins = 64

  /**
   * Mergeable fixed-bin histogram quantile sketch — the equi-width cousin
   * of t-digest/GK for engines that need CROSS-ENGINE-exact estimates: all
   * groups share one global bin grid (edges from a 1-row min/max
   * broadcast), each group's sketch is its 64 bucket counts (a plain
   * map-side-combinable groupBy — histograms from different partitions,
   * groups, or engines merge by adding counts), and the quantile estimate
   * is the classic cumulative-bin linear interpolation evaluated in EXACT
   * integer arithmetic over fixed-point values:
   *
   *   bucket  = ((cents − min) · B) div span,   span = max − min + 1
   *   target  = ⌈q·n⌉ (integer num/den),
   *   qbucket = first bucket with cum ≥ target
   *   est     = min + (qbucket·span) div B
   *                 + ((target − cum_before)·span) div (B·cnt_bucket)
   *
   * Every quantity through `est` is a BIGINT, so DuckDB reproduces the
   * estimate bit-for-bit; only the final cents→value division is float
   * (identical single IEEE op on identical integers).
   *
   * Scale shape: one 1-row global-extent aggregate, one bucket-count
   * shuffle (state ≤ groups×B rows), one ≤B-row-per-group window. The
   * raw values never reach a window or a sort.
   *
   * Output: (groupCol, n_rows, n_bins_used, q50_est, q90_est).
   */
  def histQuantile(df: DataFrame, groupCol: String, valueCol: String,
                   bins: Int = HistBins): DataFrame = {
    val cents = df.select(col(groupCol),
      round(col(valueCol) * 100).cast("long").as("__c"))
    val extent = cents.agg(min("__c").as("__min"), max("__c").as("__max"))
      .select(col("__min"), (col("__max") - col("__min") + 1L).as("__span"))
    val sketch = cents.crossJoin(broadcast(extent))
      .select(col(groupCol), col("__min"), col("__span"),
        expr(s"((__c - __min) * $bins) div __span").as("__b"))
      .groupBy(groupCol, "__min", "__span", "__b")
      .agg(count(lit(1)).as("__cnt"))
    histEstimate(sketch, groupCol, bins)
  }

  /** Bucket-count registers against a FIXED bin grid — the streaming /
    * incremental deployment shape of [[histQuantile]] (a stream can't
    * derive a global extent, so edges come from historical data; values
    * outside the grid clamp to the edge bins). A stateless projection +
    * count aggregation: runs identically under Structured Streaming in
    * complete mode with ≤ groups×bins rows of state, and registers from
    * any number of engines/streams/batches merge by adding counts. */
  def histRegisters(df: DataFrame, groupCol: String, valueCol: String,
                    minCents: Long, span: Long,
                    bins: Int = HistBins): DataFrame =
    df.select(col(groupCol),
        round(col(valueCol) * 100).cast("long").as("__c"))
      .select(col(groupCol),
        expr(s"least(greatest(((__c - ${minCents}L) * $bins) div ${span}L, 0L), ${bins - 1}L)")
          .as("__b"))
      .groupBy(groupCol, "__b").agg(count(lit(1)).as("__cnt"))

  /** Quantile estimates from fixed-grid [[histRegisters]] rows. */
  def histEstimateFixed(regs: DataFrame, groupCol: String,
                        minCents: Long, span: Long,
                        bins: Int = HistBins): DataFrame =
    histEstimate(regs.withColumn("__min", lit(minCents))
      .withColumn("__span", lit(span)), groupCol, bins)

  /** Shared estimation tail: cumulative bins + exact-integer interpolation
    * over a (groupCol, __min, __span, __b, __cnt) sketch table. */
  private def histEstimate(sketch: DataFrame, groupCol: String,
                           bins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy("__b")
    val wAll = Window.partitionBy(groupCol)
    val cum = sketch
      .withColumn("__cum", sum("__cnt").over(w))
      .withColumn("__n", sum("__cnt").over(
        wAll.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // the two quantile requests as exact integer fractions
    val qs = Seq(("q50", 1L, 2L), ("q90", 9L, 10L))
    val est = qs.map { case (label, num, den) =>
      cum.withColumn("__target", expr(s"($num * __n + $den - 1) div $den"))
        .filter(col("__cum") >= col("__target"))
        .groupBy(groupCol)
        .agg(min_by(struct(col("__b"), col("__cnt"), col("__cum"),
          col("__min"), col("__span"), col("__target")), col("__b")).as("__s"))
        .select(col(groupCol), lit(label).as("__q"),
          (col("__s.__min") + expr(s"(__s.__b * __s.__span) div $bins") +
            expr(s"((__s.__target - (__s.__cum - __s.__cnt)) * __s.__span) div (${bins}L * __s.__cnt)"))
            .as("__est_cents"))
    }.reduce(_ unionByName _)
    val stats = sketch.groupBy(groupCol)
      .agg(sum("__cnt").as("n_rows"),
        count(lit(1)).cast("int").as("n_bins_used"))
    // rename the estimate side's group key: both branches derive from the
    // same `sketch` plan and an eponymous-column self-join trips Catalyst's
    // conflicting-reference resolution on view-backed inputs
    val estWide = est.groupBy(col(groupCol).as("__g"))
      .agg(max(when(col("__q") === "q50", col("__est_cents"))).as("__e50"),
        max(when(col("__q") === "q90", col("__est_cents"))).as("__e90"))
    stats.join(estWide, col(groupCol) === col("__g"))
      .select(col(groupCol), col("n_rows"), col("n_bins_used"),
        (col("__e50").cast("double") / 100.0).as("q50_est"),
        (col("__e90").cast("double") / 100.0).as("q90_est"))
  }
}
