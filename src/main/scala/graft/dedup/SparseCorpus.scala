package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash60

/** Crawl-like sparse-similarity corpus, generated DETERMINISTICALLY from a
  * doc-id axis with cross-engine-replayable arithmetic (md5-prefix hash60 —
  * the same primitive every dedup oracle already shares with DuckDB).
  *
  * The harness's `documents` table is pathological for dedup measurement:
  * a ~31-word vocabulary drives median pairwise Jaccard to ~0.7, so the
  * near-dup answer is Θ(n²) BY CONSTRUCTION and every head looks
  * output-bound (round-4 verdict, "What's missing" #2). This fixture is the
  * regime dedup heads are actually built for:
  *
  *   - vocabulary: 500 hot words (~80% of draws) + 10,000 cold words —
  *     two random docs share a handful of hot tokens, median J ≈ 0.04;
  *   - planted clusters: residues 0–2 of every 20-id block share a base
  *     token stream; members 1–2 carry ~1/30 hash-gated token mutations
  *     (J(base, member) ≈ 0.93 ± Poisson spread, straddling the 0.9
  *     threshold the way real near-dups do);
  *   - exact duplicates: in every 5th block, member 2 is an unmutated
  *     copy of the base.
  *
  * Doc length 40–80 tokens. Everything is a pure function of (doc_id), so
  * the DuckDB oracle rebuilds the identical corpus CTE-for-CTE.
  */
object SparseCorpus {

  val HOT_VOCAB = 500
  val COLD_VOCAB = 10000
  val BLOCK = 20
  val CLUSTER_SIZE = 3 // residues 0,1,2 of each block form a cluster
  val EXACT_EVERY = 5  // block % 5 == 0 → member r=2 is an exact base copy
  val MUT_DEN = 30     // ~1/30 of a mutated member's tokens replaced
  val MIN_TOKENS = 40
  val LEN_SPREAD = 41  // n_tokens ∈ [40, 80]

  /** (doc_id, text) for every id in `idAxis` — row-local generation from
    * the id column. The id axis is first hash-spread across the session's
    * default parallelism (round-7; guide §2): the harness id axis arrives
    * as ONE cached partition, and without the repartition the generation
    * AND everything downstream of it (postings explodes, signature
    * aggregates, bucketed index writes) ran single-task in every
    * sparse-corpus gate. One exchange of bare ids buys ×cores parallelism
    * for the whole consumer chain.
    */
  def generate(idAxis: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol)
    val r = pmod(id, lit(BLOCK))
    // ids ≪ 2^53, so the double division is exact
    val blk = floor(id / BLOCK).cast("long")
    val isClust = r < CLUSTER_SIZE
    val seed = when(isClust, blk * BLOCK).otherwise(id).cast("string")
    val mutEligible = isClust && r > 0 &&
      !(r === 2 && pmod(blk, lit(EXACT_EVERY)) === 0)
    val n = (lit(MIN_TOKENS) +
      pmod(hash60(concat(lit("len|"), seed)), lit(LEN_SPREAD))).cast("int")
    val toks = transform(sequence(lit(0), n - 1), { i =>
      val pos = i.cast("string")
      val hm = hash60(concat(lit("mut|"), id.cast("string"), lit("|"), pos))
      val sel = pmod(hash60(concat(lit("sel|"), seed, lit("|"), pos)), lit(5))
      val hw = hash60(concat(lit("word|"), seed, lit("|"), pos))
      when(mutEligible && pmod(hm, lit(MUT_DEN)) === 0,
        concat(lit("m"), pmod(hm, lit(1000000)).cast("string")))
        .when(sel === 0, concat(lit("x"), pmod(hw, lit(COLD_VOCAB)).cast("string")))
        .otherwise(concat(lit("w"), pmod(hw, lit(HOT_VOCAB)).cast("string")))
    })
    graft.ops.Par.pinned(idAxis, id)
      .select(id.as("doc_id"), array_join(toks, " ").as("text"))
  }

  /** The DuckDB CTE chain rebuilding [[generate]]'s corpus bit-for-bit,
    * ending in `sparsedocs(doc_id, text)`; `srcTable` supplies the id axis.
    */
  def oracleCtes(srcTable: String = "documents"): String = {
    def H(e: String) = s"CAST(CAST(('0x' || substr(md5($e), 1, 15)) AS UBIGINT) AS BIGINT)"
    val posStr = "seed || '|' || CAST(i AS VARCHAR)"
    val mutH = H(s"'mut|' || CAST(doc_id AS VARCHAR) || '|' || CAST(i AS VARCHAR)")
    s"""sp0 AS (SELECT doc_id, doc_id % $BLOCK AS r, doc_id // $BLOCK AS blk FROM $srcTable),
       |sp1 AS (SELECT doc_id,
       |          CASE WHEN r < $CLUSTER_SIZE THEN blk * $BLOCK ELSE doc_id END AS seed,
       |          (r > 0 AND r < $CLUSTER_SIZE AND NOT (r = 2 AND blk % $EXACT_EVERY = 0)) AS mut
       |        FROM sp0),
       |sp2 AS (SELECT doc_id, CAST(seed AS VARCHAR) AS seed, mut,
       |          $MIN_TOKENS + ${H(s"'len|' || CAST(seed AS VARCHAR)")} % $LEN_SPREAD AS n
       |        FROM sp1),
       |spi AS (SELECT doc_id, seed, mut, CAST(t.i AS BIGINT) AS i
       |        FROM sp2 JOIN range(0, ${MIN_TOKENS + LEN_SPREAD}) t(i) ON t.i < sp2.n),
       |spt AS (SELECT doc_id, i,
       |          CASE WHEN mut AND $mutH % $MUT_DEN = 0
       |               THEN 'm' || CAST($mutH % 1000000 AS VARCHAR)
       |               WHEN ${H(s"'sel|' || $posStr")} % 5 = 0
       |               THEN 'x' || CAST(${H(s"'word|' || $posStr")} % $COLD_VOCAB AS VARCHAR)
       |               ELSE 'w' || CAST(${H(s"'word|' || $posStr")} % $HOT_VOCAB AS VARCHAR) END AS tok
       |        FROM spi),
       |sparsedocs AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text
       |               FROM spt GROUP BY doc_id)""".stripMargin
  }
}
