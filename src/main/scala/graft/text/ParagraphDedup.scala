package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-granularity exact deduplication (beyond-reference training-data
  * op): the Dolma/CCNet-style complement to document-level near-dup — long
  * corpora repeat boilerplate PARAGRAPHS (headers, navigation, license
  * blocks) inside otherwise-distinct documents, so dedup below the document
  * axis removes what document-level heads cannot see.
  *
  * Paragraph = consecutive non-overlapping window of `paraTokens`
  * whitespace tokens (the corpus carries no newline structure; on real data
  * the splitter is `split('\n\n')` and everything downstream is unchanged).
  *
  * Two variants, two scale shapes:
  *   - [[intraDocDedup]]: first occurrence WITHIN each document wins —
  *     a single row-local projection (array ops inside whole-stage codegen),
  *     zero shuffle at any corpus size.
  *   - [[corpusDedup]]: first GLOBAL occurrence wins (ordered by
  *     (doc_id, pos)) — one hash-shuffle on the paragraph axis to elect
  *     owners, one join back, one reassembly agg on the doc axis. The
  *     owner election is a groupBy-min (map-side partial), never a window;
  *     at 100 TB the probe side composes with [[graft.dedup.Bloom]] the
  *     same way the banded screens do (bitmap of seen paragraph hashes,
  *     exact election only for bitmap hits).
  */
object ParagraphDedup {

  /** Encoded global-order key: doc_id * POS_BASE + pos. Bounds checked at
    * runtime — a doc with ≥ POS_BASE paragraphs would corrupt the encoding,
    * so it raises instead (the cross-engine oracle shares the arithmetic).
    */
  private val POS_BASE = 100000L

  private def paras(df: DataFrame, idCol: String, textCol: String,
      paraTokens: Int): DataFrame = {
    val t = split(col(textCol), " ")
    df.select(col(idCol).as("id"), t.as("__t"))
      .withColumn("__np",
        expr(s"CAST((size(__t) + ${paraTokens - 1}) DIV $paraTokens AS INT)"))
      .withColumn("__np",
        when(col("__np") >= POS_BASE,
          raise_error(concat(lit(s"paragraphDedup: doc "), col("id"),
            lit(s" has >= $POS_BASE paragraphs — POS_BASE encoding overflow"))))
          .otherwise(col("__np")))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), col("__np") - 1),
          i => concat_ws(" ", slice(col("__t"), i * paraTokens + 1, lit(paraTokens)))))
          .as(Seq("pos", "para")))
  }

  /** Keep the first occurrence of each distinct paragraph within its own
    * document; reassemble in original order. Pure row-local: the dedup is
    * `filter(paras, (p, i) -> array_position(paras, p) == i + 1)` — no
    * shuffle, no state, fuses into the scan.
    */
  def intraDocDedup(df: DataFrame, idCol: String, textCol: String,
      paraTokens: Int): DataFrame =
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("__t"))
      .withColumn("__np",
        expr(s"CAST((size(__t) + ${paraTokens - 1}) DIV $paraTokens AS INT)"))
      .withColumn("__paras", transform(sequence(lit(0), col("__np") - 1),
        i => concat_ws(" ", slice(col("__t"), i * paraTokens + 1, lit(paraTokens)))))
      .withColumn("__kept",
        filter(col("__paras"), (p, i) => array_position(col("__paras"), p) === i + 1))
      .select(col("id"),
        array_join(col("__kept"), " ").as("clean_text"),
        size(col("__paras")).as("n_paras"),
        size(col("__kept")).as("n_kept"))

  /** Incremental paragraph screen — the Dolma production deployment of
    * sub-document dedup: the BASE corpus's distinct paragraphs fold into a
    * bloom bitmap once; each arriving batch's paragraphs are probed with
    * zero joins ([[graft.dedup.Bloom.probeBroadcast]]), and ONLY the bloom
    * hits enter the exact verification join against the base paragraph
    * table. No false negatives means misses are definitely-new and skip
    * the join entirely — at 100 TB the exact join's probe side shrinks to
    * the duplicated sliver (plus the sized-for FP rate), not the corpus.
    * Output: batch docs reassembled from paragraphs NOT present in base.
    */
  /** Prebuilt screen state: the bloom word array (driver-held, broadcast
    * into tasks) plus the exact base paragraph set — build ONCE per base
    * corpus, probe many batches (the streaming deployment's contract).
    */
  final case class ScreenIndex(words: Array[Long], basePar: DataFrame,
      mBits: Int, k: Int, paraTokens: Int)

  def buildScreenIndex(base: DataFrame, idCol: String, textCol: String,
      paraTokens: Int, mBits: Int, k: Int): ScreenIndex = {
    import graft.dedup.Bloom
    val basePar = paras(base, idCol, textCol, paraTokens).select(col("para")).distinct()
    val words = Bloom.collectWords(Bloom.bitmap(basePar, col("para"), mBits, k), mBits)
    ScreenIndex(words, basePar, mBits, k, paraTokens)
  }

  def screenedIncrement(base: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, paraTokens: Int, mBits: Int, k: Int): DataFrame =
    screenBatch(buildScreenIndex(base, idCol, textCol, paraTokens, mBits, k),
      batch, idCol, textCol)

  /** Screen one arriving batch against a prebuilt [[ScreenIndex]]. */
  def screenBatch(index: ScreenIndex, batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.dedup.Bloom
    import index.{basePar, k, mBits, paraTokens}
    val bp = paras(batch, idCol, textCol, paraTokens)
    val probed = Bloom.probeBroadcast(index.words, bp, col("para"), mBits, k)
    val misses = probed.filter(!col("bloom_hit")).drop("bloom_hit")
    // exact verify ONLY for bloom hits: left join against base, keep the
    // hits that turn out to be bitmap false positives
    val fpKept = probed.filter(col("bloom_hit")).drop("bloom_hit")
      .join(basePar.withColumn("__b", lit(1)), Seq("para"), "left")
      .filter(col("__b").isNull).drop("__b")
      .select(misses.columns.map(col): _*)
    val kept = misses.unionByName(fpKept)
    val reassembled = kept.groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          s => s.getField("para")), " ").as("clean_text"))
    val counts = bp.groupBy(col("id")).agg(count(lit(1)).cast("int").as("n_paras"))
    counts.join(reassembled, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_paras"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"))
  }

  /** Corpus-wide paragraph dedup: the globally-first (doc_id, pos)
    * occurrence of each distinct paragraph survives, every later copy —
    * across documents AND within them — is removed; documents reassemble
    * from their surviving paragraphs in original order (possibly empty).
    */
  def corpusDedup(df: DataFrame, idCol: String, textCol: String,
      paraTokens: Int): DataFrame = {
    val p = paras(df, idCol, textCol, paraTokens)
    // owner election: groupBy-min on the paragraph axis (map-side partial
    // combine; the encoded key makes "first by (doc, pos)" a plain MIN)
    val owner = p.groupBy(col("para"))
      .agg(min(col("id") * POS_BASE + col("pos")).as("__owner"))
    val kept = p.join(owner, Seq("para"))
      .filter(col("id") * POS_BASE + col("pos") === col("__owner"))
    val reassembled = kept.groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          s => s.getField("para")), " ").as("clean_text"))
    val counts = p.groupBy(col("id")).agg(count(lit(1)).cast("int").as("n_paras"))
    counts.join(reassembled, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_paras"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"))
  }
}
