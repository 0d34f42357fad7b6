package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** Sequence packing for pretraining data prep (beyond-reference
  * training-data op): concatenate each shard's documents into a token
  * stream and assign every document its position in fixed-budget packs
  * (GPT-style concatenation; documents may span pack boundaries).
  *
  * Scale design: documents are hash-sharded, and the only ordered work is a
  * running token sum WITHIN a shard — `Window.partitionBy(shard)` — so the
  * sort unit is one shard, never the corpus. At 100 TB you raise `nShards`
  * to O(total tokens / executor-memory budget) and every shard's window
  * stays a single in-memory task; packing is embarrassingly parallel across
  * shards because pack ids are (shard, pack_in_shard) pairs. One shuffle
  * total (by shard). No collect, no global sort.
  *
  * Determinism: shard = doc_id mod nShards and within-shard order is by
  * doc_id, so the layout is a pure function of the corpus — the property a
  * resumable training run needs (same data → same packs → same batches).
  */
object Packing {

  /** Per-document pack placement.
    *
    * Output: idCol, shard, n_tokens, start offset in the shard's token
    * stream, pack_id = floor(offset / budget) within the shard, offset
    * within that pack, and how many packs the document spans.
    */
  def packOffsets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(idCol),
        pmod(col(idCol), lit(nShards)).cast("int").as("shard"),
        tokenCount(col(textCol)).cast("bigint").as("n_tokens"))
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // `div` = exact integer division on longs; a double `/`+cast would
      // lose ulps once shard token streams pass 2^53 at full corpus scale
      .select(
        col(idCol),
        col("shard"),
        col("n_tokens"),
        col("offset"),
        expr(s"offset div $budget").as("pack_id"),
        pmod(col("offset"), lit(budget.toLong)).as("offset_in_pack"),
        (when(col("n_tokens") === 0, lit(1L)).otherwise(
          expr(s"(offset + n_tokens - 1) div $budget")
            - expr(s"offset div $budget") + 1L))
          .as("packs_spanned"))
  }

  /** [[packOffsets]] with an extra partition key (e.g. a train/holdout
    * split label): packing runs independently within every (key, shard)
    * stripe — each side of a release gets its own self-contained pack
    * sequence, which is what lets the two sides ship and resume
    * separately. Same shape otherwise: the only ordered work is the
    * running sum within one stripe.
    * Output: idCol, pkey, shard, n_tokens, offset, pack_id, offset_in_pack,
    * packs_spanned.
    */
  def packOffsetsKeyed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      nShards: Int,
      keyCol: org.apache.spark.sql.Column): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val w = Window.partitionBy(col("pkey"), col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(idCol),
        keyCol.as("pkey"),
        pmod(col(idCol), lit(nShards)).cast("int").as("shard"),
        tokenCount(col(textCol)).cast("bigint").as("n_tokens"))
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col(idCol),
        col("pkey"),
        col("shard"),
        col("n_tokens"),
        col("offset"),
        expr(s"offset div $budget").as("pack_id"),
        pmod(col("offset"), lit(budget.toLong)).as("offset_in_pack"),
        (when(col("n_tokens") === 0, lit(1L)).otherwise(
          expr(s"(offset + n_tokens - 1) div $budget")
            - expr(s"offset div $budget") + 1L))
          .as("packs_spanned"))
  }

  /** Pack-level fill report: tokens landing in each (shard, pack) and the
    * fill ratio vs budget. The last pack of a shard is allowed to be
    * partial; every other pack is exactly full by construction — the spec
    * asserts this invariant.
    *
    * `maxPacksSpanned` bounds the span explode explicitly: spans are
    * ceil(n_tokens/budget)+1, so the default (100k packs ≈ 25M tokens at
    * budget 256) is unreachable for any real document — a row exceeding it
    * is corrupt input (or a mis-set budget) and FAILS the job via
    * raise_error instead of silently exploding one task. The DuckDB oracle
    * mirrors the bound with its JOIN range(0, max) expansion.
    */
  /** Whole-document first-fit-decreasing bin packing — the NO-SPLIT
    * complement of [[packOffsets]]: every document lands entirely in one
    * bin (the shape SFT/instruction corpora need, where an example must
    * not cross a sequence boundary), and FFD's 11/9·OPT+1 guarantee keeps
    * wasted budget near the information-theoretic floor where greedy
    * next-fit leaves ~half-empty tails.
    *
    * Scale shape: documents hash-shard (same discipline as the offset
    * packer), each shard's list sorts DESCENDING by (tokens, id) inside a
    * bounded `sort_array(collect_list(...))`, and the fold itself is ONE
    * row-local `aggregate` expression carrying (bin loads, assignments) —
    * the sequential-by-nature algorithm runs per shard, in parallel
    * across shards, with one shuffle total. The BOUNDED UNIT is the
    * shard, harder than the offset packer's memory rule: the fold is
    * O(docs·bins) per shard (the loads array is rescanned and rebuilt per
    * document), so callers scale `nShards` to pin ~50–500 documents per
    * shard — per-shard cost is then constant and total cost linear, at
    * any corpus size. First-fit = 1-based `array_position` of the first
    * bin with room — the same primitive in the DuckDB oracle, so the
    * fold replays exactly. A document larger than the budget opens its
    * own overflow bin (no split, disclosed).
    *
    * Output: (idCol, shard, n_tokens, bin) — bin is the 0-based FFD bin
    * index within the shard.
    */
  def packBestFit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val docs = df.select(
      col(idCol).as("id"),
      pmod(col(idCol), lit(nShards.toLong)).as("shard"),
      tokenCount(col(textCol)).as("n_tokens"))
    // descending (tokens, then ascending id for ties): sort ascending on
    // (-tokens, id)
    val sharded = docs.groupBy(col("shard"))
      .agg(sort_array(collect_list(struct((-col("n_tokens")).as("negn"), col("id"))))
        .as("ds"))
    val foldExpr =
      s"""aggregate(
         |  ds,
         |  named_struct('loads', CAST(array() AS array<bigint>),
         |               'asg', CAST(array() AS array<int>)),
         |  (acc, d) -> named_struct(
         |    'loads',
         |    IF(array_position(transform(acc.loads, l -> l - d.negn <= CAST($budget AS BIGINT)), true) > 0,
         |       transform(acc.loads, (l, i) ->
         |         IF(i = CAST(array_position(transform(acc.loads, l2 -> l2 - d.negn <= CAST($budget AS BIGINT)), true) AS INT) - 1,
         |            l - d.negn, l)),
         |       concat(acc.loads, array(CAST(-d.negn AS BIGINT)))),
         |    'asg',
         |    concat(acc.asg, array(
         |      IF(array_position(transform(acc.loads, l -> l - d.negn <= CAST($budget AS BIGINT)), true) > 0,
         |         CAST(array_position(transform(acc.loads, l2 -> l2 - d.negn <= CAST($budget AS BIGINT)), true) AS INT) - 1,
         |         size(acc.loads))))))""".stripMargin
    sharded
      .withColumn("folded", expr(foldExpr))
      .select(col("shard"), explode(arrays_zip(col("ds"), col("folded.asg"))).as("z"))
      .select(col("z.ds.id").as(idCol), col("shard"),
        (-col("z.ds.negn")).as("n_tokens"), col("z.asg").as("bin"))
  }

  def packFill(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      nShards: Int,
      maxPacksSpanned: Long = 100000L): DataFrame = {
    val placed = packOffsets(df, idCol, textCol, budget, nShards)
    // A doc contributes min(end, (p+1)*budget) - max(offset, p*budget)
    // tokens to each pack p it spans; expand span-wise (spans are tiny —
    // ceil(n_tokens/budget)+1 — so the explode is O(rows), not quadratic).
    placed
      .withColumn("packs_spanned",
        when(col("packs_spanned") <= maxPacksSpanned, col("packs_spanned"))
          .otherwise(raise_error(concat(
            lit(s"packFill: document "), col(idCol).cast("string"),
            lit(" spans "), col("packs_spanned").cast("string"),
            lit(s" packs (> max $maxPacksSpanned) — corrupt input or mis-set budget")))))
      .withColumn("p", explode(sequence(col("pack_id"),
        col("pack_id") + col("packs_spanned") - 1)))
      .withColumn("tok_in_pack",
        least(col("offset") + col("n_tokens"), (col("p") + 1) * budget)
          - greatest(col("offset"), col("p") * budget))
      .groupBy(col("shard"), col("p").as("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok_in_pack")).as("n_tokens"),
        round(sum(col("tok_in_pack")) / lit(budget.toDouble), 6).as("fill"))
  }
}
