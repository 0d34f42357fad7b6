package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))

  test("offsets are the running token sum in doc_id order within a shard") {
    // one shard (nShards = 1): docs of 3, 4, 2 tokens, budget 4
    val docs = Seq(doc(0L, 3), doc(1L, 4), doc(2L, 2)).toDF("doc_id", "text")
    val out = Packing.packOffsets(docs, "doc_id", "text", budget = 4, nShards = 1)
      .orderBy("doc_id")
      .select("offset", "pack_id", "offset_in_pack", "packs_spanned")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc0: [0,3) pack0; doc1: [3,7) spans packs 0-1; doc2: [7,9) spans 1-2
    assert(out === Seq((0L, 0L, 0L, 1L), (3L, 0L, 3L, 2L), (7L, 1L, 3L, 2L)))
  }

  test("sharding is by doc_id mod nShards; streams are independent") {
    val docs = Seq(doc(0L, 5), doc(1L, 7), doc(2L, 5), doc(3L, 1))
      .toDF("doc_id", "text")
    val out = Packing.packOffsets(docs, "doc_id", "text", budget = 8, nShards = 2)
      .orderBy("doc_id").select("shard", "offset")
      .as[(Int, Long)].collect().toSeq
    // shard 0: docs 0 (off 0), 2 (off 5); shard 1: docs 1 (off 0), 3 (off 7)
    assert(out === Seq((0, 0L), (1, 0L), (0, 5L), (1, 7L)))
  }

  test("zero-token docs occupy one pack position and contribute no tokens") {
    val docs = Seq((0L, "x y"), (1L, "")).toDF("doc_id", "text")
    // NB split("", " ") yields [""], one token of length 0 — emulate a truly
    // empty doc via a doc whose tokens pack to a boundary instead
    val out = Packing.packOffsets(docs, "doc_id", "text", budget = 2, nShards = 1)
      .orderBy("doc_id").select("n_tokens", "packs_spanned")
      .as[(Long, Long)].collect().toSeq
    assert(out.head === ((2L, 1L)))
    assert(out(1)._2 === 1L)
  }

  test("every non-terminal pack is exactly full; totals are conserved") {
    val docs = (0L until 40L).map(i => doc(i, (i % 7).toInt + 1))
      .toDF("doc_id", "text")
    val budget = 16
    val fill = Packing.packFill(docs, "doc_id", "text", budget, nShards = 4)
    val byShard = fill.groupBy("shard")
      .agg(max("pack_id").as("last"), sum("n_tokens").as("tot")).collect()
    val full = fill
      .join(byShard.toSeq.map(r => (r.getInt(0), r.getLong(1)))
        .toDF("shard", "last"), Seq("shard"))
      .filter(col("pack_id") < col("last"))
      .select("n_tokens").as[Long].collect()
    assert(full.nonEmpty && full.forall(_ == budget.toLong))
    // conservation: pack tokens == input tokens
    val totPacked = fill.agg(sum("n_tokens")).as[Long].head()
    val totInput = docs.select(sum(size(split(col("text"), " ")))).as[Long].head()
    assert(totPacked === totInput)
  }

  test("a document spanning more than maxPacksSpanned packs fails loudly") {
    // budget 4 with a 50-token doc spans 13 packs; cap at 10 must raise
    // instead of silently exploding the span
    val docs = Seq(doc(0L, 50), doc(1L, 3)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Packing.packFill(docs, "doc_id", "text", budget = 4, nShards = 1,
        maxPacksSpanned = 10L).count()
    }
    assert(e.getMessage.contains("packFill") || e.getCause != null)
    // and the same corpus under the default (generous) cap is fine
    val ok = Packing.packFill(docs, "doc_id", "text", budget = 4, nShards = 1)
    assert(ok.agg(sum("n_tokens")).as[Long].head() === 53L)
  }

  test("layout is deterministic: same corpus, same packs across runs") {
    val docs = (0L until 25L).map(i => doc(i, (i % 5).toInt + 2))
      .toDF("doc_id", "text").repartition(7) // physical layout must not matter
    def run() = Packing.packOffsets(docs, "doc_id", "text", 32, 3)
      .orderBy("doc_id").collect().toSeq
    assert(run() === run())
  }

  test("packBestFit: hand-traced FFD fold on one shard") {
    // budget 10, sizes 6,5,4,3,2 → sorted desc: 6→bin0, 5→bin1 (6+5>10),
    // 4→bin0 (=10), 3→bin1 (=8), 2→bin1 (=10): two exactly-full bins
    val docs = Seq(doc(0L, 6), doc(1L, 5), doc(2L, 4), doc(3L, 3), doc(4L, 2))
      .toDF("doc_id", "text")
    val out = Packing.packBestFit(docs, "doc_id", "text", budget = 10, nShards = 1)
      .select("doc_id", "bin").as[(Long, Int)].collect().toMap
    assert(out == Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1, 4L -> 1))
  }

  test("packBestFit: an over-budget document opens its own overflow bin") {
    val docs = Seq(doc(0L, 15), doc(1L, 9), doc(2L, 2)).toDF("doc_id", "text")
    val out = Packing.packBestFit(docs, "doc_id", "text", budget = 10, nShards = 1)
      .select("doc_id", "bin").as[(Long, Int)].collect().toMap
    // 15 → bin0 alone (overflow); 9 → bin1; 2 → bin1? 9+2>10 → no, bin2...
    // first-fit checks bin0 (15+2>10) then bin1 (9+2>10) → new bin2
    assert(out == Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("packBestFit invariants on the harness corpus: loads bounded, fewer bins than arrival-order next-fit") {
    val d = graft.sources.Tables.cached(spark, "/root/testdata/sf0.001", "documents")
    val out = Packing.packBestFit(d, "doc_id", "text", budget = 100, nShards = 4)
      .select("doc_id", "shard", "n_tokens", "bin")
      .as[(Long, Long, Int, Int)].collect()
    // recompute loads: every multi-doc bin within budget; overflow bins solo
    out.groupBy(t => (t._2, t._4)).foreach { case ((s, b), ds) =>
      val load = ds.map(_._3).sum
      assert(load <= 100 || ds.length == 1, s"shard $s bin $b load $load")
    }
    // FFD uses no more bins than a doc_id-order greedy next-fit per shard
    val ffdBins = out.groupBy(_._2).view.mapValues(_.map(_._4).max + 1).toMap
    val nfBins = out.groupBy(_._2).view.mapValues { ds =>
      var bins = 1; var load = 0
      ds.sortBy(_._1).foreach { t =>
        if (load + t._3 > 100 && load > 0) { bins += 1; load = 0 }
        load += t._3
      }
      bins
    }.toMap
    ffdBins.foreach { case (s, n) => assert(n <= nfBins(s), s"shard $s ffd $n nf ${nfBins(s)}") }
    // deterministic under physical layout changes
    val again = Packing.packBestFit(d.repartition(13), "doc_id", "text", budget = 100, nShards = 4)
      .select("doc_id", "shard", "n_tokens", "bin")
      .as[(Long, Long, Int, Int)].collect()
    assert(again.toSet == out.toSet)
  }

  test("packOffsetsKeyed: each key stripe packs exactly like a standalone run") {
    val docs = (0L until 40L).map(i =>
      (i, (0 until (i % 7 + 1).toInt).map(t => s"w$t").mkString(" "),
        if (i % 3 == 0) "holdout" else "train")).toDF("doc_id", "text", "split")
    val keyed = Packing.packOffsetsKeyed(docs, "doc_id", "text",
        budget = 16, nShards = 2, keyCol = col("split"))
      .collect().map(r => (r.getString(1), r.getLong(0)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    for (side <- Seq("train", "holdout")) {
      val alone = Packing.packOffsets(docs.filter(col("split") === side),
          "doc_id", "text", budget = 16, nShards = 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      alone.foreach { case (id, v) =>
        assert(keyed((side, id)) == v, s"$side doc $id diverged from standalone packing")
      }
    }
  }
}
