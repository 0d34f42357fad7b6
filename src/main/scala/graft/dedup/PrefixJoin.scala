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
    val toks = df
      .select(col(idCol).as("id"), explode(Dedup.shingles(col(textCol), n)).as("tok"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // row-local rare-first ordering: array_sort on (df, tok) structs
    val sorted = toks.join(dfreq, Seq("tok"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("__dt"))
      .select(col("id"),
        transform(col("__dt"), s => s.getField("tok")).as("toks"),
        size(col("__dt")).as("m"))
    // minOverlap = ceil(T·m / 10⁶) exactly: T·m + 10⁶−1 ≤ ~1e12 is
    // double-exact, and the quotient is either exactly integral or ≥ 1e-6
    // away from one — floor cannot flip
    val minOv = floor((lit(t6) * col("m") + lit(SCALE - 1)).cast("double") / lit(SCALE.toDouble))
    val withPrefix = sorted.withColumn("__plen", (col("m") - minOv + 1).cast("int"))
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
