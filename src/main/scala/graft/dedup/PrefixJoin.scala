package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filter exact similarity join (AllPairs / PPJoin family —
  * Bayardo et al. 2007 "Scaling Up All Pairs Similarity Search", Xiao et
  * al. 2008 PPJoin): ALL pairs with shingle Jaccard ≥ t, without blocking
  * assumptions and without LSH's probabilistic recall. The third exact
  * head next to [[Dedup.ngramJaccardPairs]] (bounded-verify, needs a
  * caller-guaranteed block) and [[Dedup.minhashLshPairs]] (scales, but
  * banding recall < 1).
  *
  * The filter: order every document's token set by ascending document
  * frequency (rarest first, ties by token — ANY common total order works);
  * a document with m tokens keeps only its first m − ⌈t·m⌉ + 1 tokens as
  * its PREFIX. J(A,B) ≥ t forces |A∩B| ≥ ⌈t·m⌉ on both sides (the union
  * is at least as large as either set), and a pair whose prefixes are
  * disjoint can share at most ⌈t·m⌉ − 1 tokens (every common token would
  * have to sit in the later-ending suffix), so candidates = the
  * prefix-token self-join, LOSSLESSLY. Rare-first ordering keeps prefix
  * postings lists short — df-hot tokens never enter a prefix at high t —
  * which is why candidate volume collapses on sparse corpora.
  *
  * ⌈t·m⌉ and the length filter run in EXACT integer arithmetic on the
  * 6-dp threshold numerator T = round(t·10⁶): a double `ceil(t*m)`
  * overshoots by one when t·m is mathematically integral but the product
  * rounds up (0.8·5 → 4.0000000000000002 → ceil 5), silently shortening
  * the prefix and LOSING boundary pairs — exactly the pairs that sit at
  * sim = t.
  *
  * Scale shape: token df is one aggregate on the vocab axis; the df join
  * back is a plain equi-join on the gram key; per-document ordering is a
  * ROW-LOCAL array_sort (no global rank — ordering by the (df, token)
  * tuple directly avoids materializing a dense vocabulary rank at 100 TB);
  * the candidate join runs on prefix postings only; the exact verify is a
  * row-local array_intersect on the surviving pairs. The length filter
  * (10⁶·m_b ≥ T·m_a ∧ 10⁶·m_a ≥ T·m_b, necessary for J ≥ t) prunes
  * candidates before verification. No stage touches the all-pairs axis.
  *
  * Output: (id_a, id_b, sim) with id_a < id_b, sim ≥ t, 6 dp — identical
  * rows to an exhaustive all-pairs Jaccard (the gate's DuckDB oracle IS
  * the exhaustive computation, proving losslessness per run).
  */
object PrefixJoin {

  private val SCALE = 1000000L
  private val ENC = 1000000000000L // ids < 10¹² by the screen contract

  /** Row-local rare-first-sorted token frame: (id, toks, m). */
  private def sortedTokens(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = df
      .select(col(idCol).as("id"), explode(Dedup.shingles(col(textCol), n)).as("tok"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    toks.join(dfreq, Seq("tok"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("__dt"))
      .select(col("id"),
        transform(col("__dt"), s => s.getField("tok")).as("toks"),
        size(col("__dt")).as("m"))
  }

  /** Exact integer ⌈t·m⌉ on the 6-dp threshold numerator (see class doc). */
  private def minOverlap(t6: Long, m: org.apache.spark.sql.Column) =
    floor((lit(t6) * m + lit(SCALE - 1)).cast("double") / lit(SCALE.toDouble))

  /** PERSISTENT exact-dedup index: the base corpus's prefix postings as an
    * on-disk bucketed table on the gram key — the cross-job deployment
    * shape of [[jaccardPrefixJoin]]'s base side (build ONCE, probe every
    * arriving batch shuffle-free). Each posting carries the document's
    * full sorted token array so the probe's verify is ROW-LOCAL on the
    * joined row — the documented trade: token storage multiplies by the
    * prefix length (≈ (1−t)·m + 1 entries/doc) in exchange for a screen
    * with exactly ONE join and no verify shuffle.
    */
  def persistentPrefixIndex(
      base: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      table: String,
      nBuckets: Int = 16): DataFrame = {
    val t6 = math.round(threshold * SCALE)
    require(t6 / SCALE.toDouble == threshold,
      s"threshold must be a 6-dp decimal: $threshold")
    val sorted = sortedTokens(base, idCol, textCol, n)
      .withColumn("__plen", (col("m") - minOverlap(t6, col("m")) + 1).cast("int"))
    val postings = sorted
      .select(explode(slice(col("toks"), lit(1), col("__plen"))).as("tok"),
        col("id").as("id_b"), col("m").as("m_b"), col("toks").as("toks_b"))
    graft.sources.PartitionedSink.writeBucketedTable(postings, "tok", nBuckets, table)
  }

  /** Screen an arriving batch against the persistent prefix index. The
    * probe side needs NO prefix (and therefore no order coordination with
    * the index): J(A,B) ≥ t forces |A∩B| ≥ ⌈t·|B|⌉ while B's suffix holds
    * only ⌈t·|B|⌉ − 1 tokens, so at least one shared token sits in B's
    * INDEXED prefix — single-sided pigeonhole, lossless. Hot-token
    * suppression lives where it matters: on the corpus-sized base side.
    *
    * The probe's token postings are bucketed like the index, so the
    * candidate join runs with ZERO shuffle exchanges (runtime-asserted);
    * the verify is row-local (both token arrays ride the join row) and
    * the per-probe summary is one batch-axis aggregate.
    *
    * Output: (id, n_matches, best_sim, match_id) for EVERY probe doc —
    * best = highest similarity, ties to the smallest base id, via the
    * exact integer (1e6 − sim·1e6)·10¹² + id encoding.
    */
  def screenAgainstPrefixIndex(
      index: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      probeTable: String,
      nBuckets: Int = 16): DataFrame = {
    val probe = batch
      .select(col(idCol).as("id_a"), Dedup.shingles(col(textCol), n).as("toks_a"))
      .select(col("id_a"), col("toks_a"), explode(col("toks_a")).as("tok"),
        size(col("toks_a")).as("m_a"))
    val probeBucketed = graft.sources.PartitionedSink.writeBucketedTable(
      probe, "tok", nBuckets, probeTable)
    val joined = probeBucketed.join(index, Seq("tok"))
      .filter(col("m_b") * SCALE >= lit(math.round(threshold * SCALE)) * col("m_a") &&
        col("m_a") * SCALE >= lit(math.round(threshold * SCALE)) * col("m_b"))
    require(graft.sources.PartitionedSink.isShuffleFree(joined),
      "prefix-index probe join introduced a shuffle exchange — " +
        "index and probe must be co-bucketed on tok")
    val verified = joined
      .withColumn("sim", Dedup.jaccard(col("toks_a"), col("toks_b")))
      .filter(col("sim") >= threshold)
      .withColumn("__enc",
        (lit(SCALE) - round(round(col("sim"), 6) * SCALE).cast("long")) * lit(ENC) +
          col("id_b"))
    val summary = verified.groupBy(col("id_a"))
      .agg(countDistinct(col("id_b")).as("n_matches"), min(col("__enc")).as("__e"))
      .select(col("id_a").as("id"), col("n_matches"),
        ((lit(SCALE) - expr(s"__e div ${ENC}L")).cast("double") / SCALE).as("best_sim"),
        expr(s"__e % ${ENC}L").as("match_id"))
    batch.select(col(idCol).as("id")).join(summary, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best_sim"), col("match_id"))
  }

  def jaccardPrefixJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]: $threshold")
    val t6 = math.round(threshold * SCALE)
    require(t6 / SCALE.toDouble == threshold,
      s"threshold must be a 6-dp decimal for exact prefix arithmetic: $threshold")
    // minOverlap = ceil(T·m / 10⁶) exactly: T·m + 10⁶−1 ≤ ~1e12 is
    // double-exact, and the quotient is either exactly integral or ≥ 1e-6
    // away from one — floor cannot flip
    val sorted = sortedTokens(df, idCol, textCol, n)
    val withPrefix = sorted.withColumn("__plen",
      (col("m") - minOverlap(t6, col("m")) + 1).cast("int"))
    val prefixes = withPrefix
      .select(col("id"), col("m"),
        explode(slice(col("toks"), lit(1), col("__plen"))).as("tok"))
    val cands = prefixes.as("a")
      .join(prefixes.as("b"), col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .filter(col("b.m") * SCALE >= lit(t6) * col("a.m") &&
        col("a.m") * SCALE >= lit(t6) * col("b.m"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val full = sorted.select(col("id"), col("toks"))
    cands
      .join(full.select(col("id").as("id_a"), col("toks").as("__ta")), Seq("id_a"))
      .join(full.select(col("id").as("id_b"), col("toks").as("__tb")), Seq("id_b"))
      .withColumn("sim", Dedup.jaccard(col("__ta"), col("__tb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }
}
