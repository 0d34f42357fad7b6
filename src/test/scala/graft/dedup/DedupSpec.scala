package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  // planted corpus: 0/1 exact dups, 2 near-dup of 0 (one word changed),
  // 3 unrelated
  private def corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta", "s0"),
    (1L, "alpha beta gamma delta epsilon zeta", "s0"),
    (2L, "alpha beta gamma delta epsilon eta", "s0"),
    (3L, "one two three four five six", "s0")
  ).toDF("doc_id", "text", "source")

  test("exactGroups: identical texts collapse to one canonical id") {
    val g = Dedup.exactGroups(corpus, "doc_id", "text").collect()
    assert(g.length == 3)
    val dup = g.find(_.getAs[Long]("n_dups") == 2).get
    assert(dup.getAs[Long]("canonical_id") == 0L)
  }

  test("unigram jaccard pairs find exact and near dups, not unrelated") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", "source", n = 1, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))     // exact: jaccard 1.0
    assert(pairs.contains((0L, 2L)))     // near: 5/7 = 0.714
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // disjoint vocab
  }

  test("minhash LSH: candidates recover exact duplicates; verified pairs subset of true jaccard pairs") {
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", n = 1, k = 16, nBands = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // identical docs have identical signatures -> guaranteed candidate + verified
    assert(lsh.contains((0L, 1L)))
    val brute = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", "source", n = 1, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute)) // verify step enforces the true-jaccard threshold
  }

  test("hot-bucket cap: mega-buckets contribute linear hub stars, not pair bombs") {
    // 20 identical boilerplate docs form a mega-bucket in EVERY band; the
    // two planted near-dups live in normal buckets
    val boiler = (100L to 119L).map(i => (i, "the same boilerplate text here", "s1"))
    val df = (Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "s0"),
      (1L, "alpha beta gamma delta epsilon zeta", "s0")) ++ boiler)
      .toDF("doc_id", "text", "source")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text", 1, 16).cache()
    val uncapped = Dedup.lshCandidates(sigs, 4, 16)
      .as[(Long, Long)].collect().toSet
    val capped = Dedup.lshCandidates(sigs, 4, 16, maxBucketSize = Some(10))
      .as[(Long, Long)].collect().toSet
    // uncapped: C(20,2)=190 boilerplate pairs; capped: only the 19-edge hub
    // star (min id 100 vs each member) — O(bucket), connectivity preserved
    assert(uncapped.count { case (a, b) => a >= 100 && b >= 100 } == 190)
    val megaPairs = capped.filter { case (a, b) => a >= 100 && b >= 100 }
    assert(megaPairs == (101L to 119L).map(b => (100L, b)).toSet,
      s"expected the hub star, got $megaPairs")
    // the planted pair survives the cap untouched
    assert(capped.contains((0L, 1L)))
    // histogram exposes the mega-bucket for tuning
    val sizes = Dedup.lshBucketSizes(sigs, 4, 16)
      .filter(col("n") > 10).select("n").as[Long].collect()
    assert(sizes.nonEmpty && sizes.forall(_ == 20L))
    // the cap threads through the end-to-end pipeline (what the flagship
    // cluster/curation queries call): star edges are verified like any
    // candidate, and identical boilerplate passes at J=1 — the cluster
    // stays connected through the hub at linear cost
    val e2e = Dedup.minhashLshPairs(df, "doc_id", "text", n = 1, k = 16, nBands = 4,
      threshold = 0.5, maxBucketSize = Some(10))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(e2e.filter { case (a, b) => a >= 100 && b >= 100 } ==
      (101L to 119L).map(b => (100L, b)).toSet)
    assert(e2e.contains((0L, 1L)))
  }

  test("simhash banded pairs: pigeonhole guarantee recovers all pairs within maxHamming") {
    val df = corpus
    val pairs = Dedup.simhashNearDupPairs(df, "doc_id", "text", bits = 48, nBands = 4, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // exact duplicates: hamming 0, always found
    assert(pairs.get((0L, 1L)).contains(0))
    // brute-force ground truth: banding must find EVERY pair within the cap
    val sigs = Dedup.simhash(df, "doc_id", "text", bits = 48)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b) -> h).toMap
    assert(pairs == truth, s"banded pairs $pairs != brute-force truth $truth")
  }

  test("minhash signature is order-insensitive and length-k per doc") {
    val df = Seq((0L, "a b c"), (1L, "c b a")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text", n = 1, k = 8)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("i"), r.getAs[Long]("minh")))
    assert(sigs.length == 16)
    val byDoc = sigs.groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSet).toMap
    assert(byDoc(0L) == byDoc(1L)) // same shingle set -> same signature
  }

  test("aggregator-based signatures equal the explode formulation exactly") {
    val df = corpus
    val viaAgg = Dedup.minhashSignaturesAgg(df, "doc_id", "text", n = 1, k = 16)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("i"), r.getAs[Long]("minh"))).toSet
    val viaExplode = Dedup.minhashSignaturesExploded(df, "doc_id", "text", n = 1, k = 16)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("i"), r.getAs[Long]("minh"))).toSet
    assert(viaAgg == viaExplode)
    assert(viaAgg.size == 4 * 16)
    // round-7: the DEFAULT path is the one-aggregation wide form — it must
    // reproduce the explode formulation value-for-value too
    val viaWide = Dedup.minhashSignatures(df, "doc_id", "text", n = 1, k = 16)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("i"), r.getAs[Long]("minh"))).toSet
    assert(viaWide == viaExplode)
  }

  test("connectedComponents: chains collapse to min id, singletons keep their own") {
    val nodes = (0L to 6L).toDF("id")
    // chain 0-1-2, pair 3-4, singletons 5, 6
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(cc == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 6L))
  }

  test("connectedComponents: long chain needs multiple propagation rounds") {
    val n = 12
    val nodes = (0L until n.toLong).toDF("id")
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(nodes, pairs)
      .collect().map(_.getAs[Long]("cluster")).distinct
    assert(cc.toSeq == Seq(0L))
  }

  test("incrementalComponents == full recompute; merges, bridges, new singletons") {
    // base: chain 0-1-2 (cluster 0), pair 3-4 (cluster 3), singletons 5, 6
    val baseNodes = (0L to 6L).toDF("id")
    val basePairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val baseLabels = Dedup.connectedComponents(baseNodes, basePairs)
    // batch: 7 attaches to cluster 0; 8 BRIDGES clusters 0 and 3 (via 7
    // and 4); 9 is a new singleton
    val newNodes = Seq(7L, 8L, 9L).toDF("id")
    val newEdges = Seq((2L, 7L), (7L, 8L), (8L, 4L)).toDF("id_a", "id_b")
    val inc = Dedup.incrementalComponents(baseLabels, newNodes, newEdges)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    val full = Dedup.connectedComponents((0L to 9L).toDF("id"),
        basePairs.unionByName(newEdges))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(inc == full)
    // the bridge united 0-1-2-3-4-7-8 under min id 0; 9 is its own cluster
    assert(inc(8L) == 0L && inc(4L) == 0L && inc(9L) == 9L && inc(5L) == 5L)
  }

  test("incrementalComponents chains across batches: streamed maintenance == full CC") {
    // the per-ingest maintenance loop: labels fold through three arriving
    // edge batches; every intermediate state is a valid clustering of the
    // edges seen so far, and the final state equals the one-shot CC
    val batches = Seq(
      (Seq(10L, 11L), Seq((10L, 11L))),
      (Seq(12L, 13L), Seq((11L, 12L))),          // attach to the 10-11 pair
      (Seq(14L), Seq((13L, 14L), (14L, 10L))))   // cycle back
    var labels = Dedup.connectedComponents(
      Seq(0L, 1L).toDF("id"), Seq((0L, 1L)).toDF("id_a", "id_b"))
    batches.foreach { case (ids, edges) =>
      labels = Dedup.incrementalComponents(labels, ids.toDF("id"),
        edges.toDF("id_a", "id_b"))
    }
    val finalMap = labels.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    val allEdges = (Seq((0L, 1L)) ++ batches.flatMap(_._2)).toDF("id_a", "id_b")
    val full = Dedup.connectedComponents(
        (Seq(0L, 1L) ++ batches.flatMap(_._1)).toDF("id"), allEdges)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(finalMap == full)
    assert(Set(10L, 11L, 12L, 13L, 14L).forall(finalMap(_) == 10L))
  }

  test("simhash: identical texts equal; near-dup within small hamming distance; unrelated far") {
    val hashes = Dedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(hashes(0L) == hashes(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hashes(0L), hashes(2L)) < hamming(hashes(0L), hashes(3L)))
  }

  test("simhashScreen: batch probes base only — exact copy flagged at hamming 0, batch-internal dups ignored") {
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words live here nowhere else")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of base 1
      (11L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of 10 AND base 1
      (12L, "qq ww ee rr tt yy uu ii oo pp aa ss dd ff")       // novel vocab
    ).toDF("doc_id", "text")
    val out = Dedup.simhashScreen(base, batch, "doc_id", "text", maxHamming = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3)))).toMap
    assert(out.contains(10L) && out(10L)._2 === 0 && out(10L)._3 === 1L)
    // 11 matches base 1 (not batch-mate 10 — only base ids can be match_id)
    assert(out(11L)._3 === 1L)
    assert(!out.contains(12L), "novel doc must pass the screen")
    // base docs never appear as probed ids
    assert(out.keySet.forall(_ >= 10L))
  }

  test("persistent bucketed index screen: shuffle-free probe join, output equals in-memory screen") {
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words live here nowhere else"),
      (3L, "yet more unrelated base corpus content words")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of base 1
      (11L, "qq ww ee rr tt yy uu ii oo pp aa ss dd ff")       // novel vocab
    ).toDF("doc_id", "text")
    val suffix = "spec_" + System.nanoTime() // fresh tables per run
    val index = Dedup.persistentBandedIndex(base, "doc_id", "text",
      s"graft_test_index_$suffix")
    // the probe join must be exchange-free: both sides read bucketed on bk
    val joined = Dedup.probeJoinAgainstPersistentIndex(index, batch, "doc_id", "text",
      s"graft_test_probe_$suffix")
    assert(graft.sources.PartitionedSink.isShuffleFree(joined),
      s"probe join shuffled:\n${joined.queryExecution.executedPlan}")
    val persistent = Dedup.screenAgainstPersistentIndex(index, batch, "doc_id", "text",
      s"graft_test_probe_$suffix")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).sortBy(_._1)
    val inMemory = Dedup.simhashScreen(base, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).sortBy(_._1)
    assert(persistent.toSeq == inMemory.toSeq,
      "persistent-index screen diverged from the in-memory screen")
    assert(persistent.exists(r => r._1 == 10L && r._3 == 0 && r._4 == 1L))
  }

  test("simhashWide at 48 bits reproduces the narrow signature word-for-word") {
    // one word per band, bandBits=4: word w of the wide signature must equal
    // (narrow >> 4w) & 15 — narrow and wide heads are interchangeable
    val wide = Dedup.simhashWide(corpus, "doc_id", "text", bits = 48, nBands = 12)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val narrow = Dedup.simhash(corpus, "doc_id", "text", bits = 48)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide.keySet == narrow.keySet)
    wide.foreach { case (id, words) =>
      assert(words.length == 12)
      val rebuilt = words.zipWithIndex.map { case (w, i) => w << (4 * i) }.reduce(_ | _)
      assert(rebuilt == narrow(id), s"doc $id: wide words $words != narrow ${narrow(id)}")
    }
  }

  test("simhashWide 96-bit: words past bit 60 draw from the salted hash chunk, not zeros") {
    val wide = Dedup.simhashWide(corpus, "doc_id", "text", bits = 96, nBands = 12)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // exact duplicates still agree on every word
    assert(wide(0L) == wide(1L))
    // the high 4 words (bits 64..95) must carry signal: across the corpus
    // they cannot all be 0 or all identical between unrelated docs
    val high = wide.values.map(_.drop(8)).toSeq
    assert(high.distinct.size > 1, s"high words degenerate: $high")
  }

  test("simhashWideNearDupPairs: pigeonhole recall vs brute-force over wide signatures") {
    val pairs = Dedup.simhashWideNearDupPairs(corpus, "doc_id", "text",
      bits = 96, nBands = 12, maxHamming = 11)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val sigs = Dedup.simhashWide(corpus, "doc_id", "text", bits = 96, nBands = 12)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val truth = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = sigs(a).zip(sigs(b)).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if h <= 11
    } yield (a, b) -> h).toMap
    assert(pairs == truth, s"wide banded pairs $pairs != brute-force truth $truth")
    assert(pairs.get((0L, 1L)).contains(0)) // exact dup at hamming 0
  }

  test("wide Jaccard head: verified pairs subset of narrow head's at equal maxHamming; exact dups always survive") {
    // hamming scales with bits, so maxHamming=11 is a TIGHTER fractional
    // cut at 96 bits than at 48 — wide candidates (and thus verified pairs)
    // are a subset; hamming-0 exact dups survive any cut. The recall-vs-
    // collision trade at the flagship threshold is measured in SCALE.md.
    val wide = Dedup.simhashWideJaccardPairs(corpus, "doc_id", "text", n = 1, threshold = 0.5)
      .select("id_a", "id_b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val narrow = Dedup.simhashJaccardPairs(corpus, "doc_id", "text", n = 1, threshold = 0.5)
      .select("id_a", "id_b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(wide.subsetOf(narrow))
    assert(wide.exists { case (a, b, _) => a == 0L && b == 1L }) // exact dup
  }

  test("touching head equals the full pair set restricted to batch endpoints") {
    import spark.implicits._
    // realistic slice: the sf0.001 documents table, batch = every 5th doc
    val d = graft.sources.Tables.cached(spark, "/root/testdata/sf0.001", "documents")
    val batchIds = d.filter(col("doc_id") % 5 === 0).select("doc_id")
    val got = Dedup.simhashJaccardPairsTouching(d, batchIds, "doc_id", "text")
      .select("id_a", "id_b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.simhashJaccardPairs(d, "doc_id", "text")
      .select("id_a", "id_b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.filter { case (a, b, _) => a % 5 == 0 || b % 5 == 0 }
    assert(got == expected)
    assert(got.nonEmpty && got.size < full.size) // restriction is real
  }

  test("clusterSplit: no near-dup pair ever straddles train/holdout") {
    import spark.implicits._
    // three exact-dup families + singletons: every family must land whole
    val rows = (0L until 30L).flatMap { f =>
      Seq((f * 10, s"family $f body text shared"), (f * 10 + 1, s"family $f body text shared"))
    } ++ (1000L until 1020L).map(i => (i, s"singleton unique $i content"))
    val df = rows.toDF("doc_id", "text")
    val out = Dedup.clusterSplit(df, "doc_id", "text",
      n = 1, k = 16, nBands = 4, threshold = 0.9,
      maxBucketSize = Some(250), holdoutPct = 30)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // duplicates share cluster AND split
    (0L until 30L).foreach { f =>
      assert(out(f * 10) == out(f * 10 + 1), s"family $f straddles: ${out(f * 10)} vs ${out(f * 10 + 1)}")
    }
    // the hash split actually uses both sides
    val splits = out.values.map(_._2).toSet
    assert(splits == Set("train", "holdout"), s"degenerate split: $splits")
    // split is a pure function of the cluster label: layout-independent
    val out2 = Dedup.clusterSplit(df.repartition(7), "doc_id", "text",
      n = 1, k = 16, nBands = 4, threshold = 0.9,
      maxBucketSize = Some(250), holdoutPct = 30)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out == out2)
  }

  test("containment catches the asymmetric quote Jaccard misses, directionally") {
    import spark.implicits._
    // B = 40 distinct-gram tokens; A = B's first 10 tokens verbatim.
    // 3-grams: |S(B)| = 38, |S(A)| = 8, all of S(A) ⊂ S(B).
    val long = (0 until 40).map(i => s"tok$i").mkString(" ")
    val short = (0 until 10).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, short), (2L, long), (3L, "unrelated words only here now")).toDF("id", "text")
    val out = Dedup.containmentPairs(df, "id", "text", n = 3, threshold = 0.5, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(out((1L, 2L)) == 1.0, s"quote not fully contained: $out")
    assert(!out.contains((2L, 1L)), "reverse direction (8/38) must fall below threshold")
    assert(!out.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // the same pair under symmetric Jaccard: 8/38 — invisible at any
    // near-dup threshold; that asymmetry is the operator's reason to exist
    val j = Dedup.ngramJaccardPairs(
      df.withColumn("blk", lit(1)), "id", "text", "blk", n = 3, threshold = 0.5)
    assert(j.filter(col("id_a") === 1 && col("id_b") === 2).isEmpty, "Jaccard should miss the quote")
  }

  test("containment maxDf cap: boilerplate grams beyond the cap carry no signal") {
    import spark.implicits._
    // the same 5-token block in 6 docs: every one of its grams has df 6 > maxDf 5
    // → informative sets are empty → no pairs at all
    val block = "shared legal boilerplate block"
    val df = (1L to 6L).map(i => (i, block)).toDF("id", "text")
    assert(Dedup.containmentPairs(df, "id", "text", n = 3, threshold = 0.1, maxDf = 5).isEmpty)
    // at maxDf 6 the block is informative again and all 30 directed pairs emerge
    assert(Dedup.containmentPairs(df, "id", "text", n = 3, threshold = 0.1, maxDf = 6)
      .count() == 30L)
  }

  test("wide head at matched fractional hamming (96 bits, 24 bands, h<=22) finds the same verified pairs here") {
    // same 23% fractional cut as the narrow default (11/48 = 22/96): on the
    // planted corpus the verified pair sets coincide
    val wide = Dedup.simhashWideJaccardPairs(corpus, "doc_id", "text", n = 1,
      threshold = 0.5, bits = 96, nBands = 24, maxHamming = 22)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = Dedup.simhashJaccardPairs(corpus, "doc_id", "text", n = 1, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == narrow)
  }

  test("first-band candidate dedup: all-band-matching pairs surface exactly once, rows pre-distinct ≈ pairs") {
    // exact duplicates match in EVERY band — the round-8 first-matching-band
    // filter must (a) keep them (recall unchanged: the pair survives via its
    // first matching band) and (b) emit them exactly once into the distinct,
    // not once per band. (a) is behavioral; (b) is asserted structurally by
    // running the head with distinct-free semantics: counting output rows of
    // a groupBy over the pre-distinct frame is not exposed, so we assert the
    // documented contract — output rows are unique — plus hamming-0 recall.
    import spark.implicits._
    val dups = Seq(
      (0L, "alpha beta gamma delta"), (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), (3L, "unrelated words entirely different")
    ).toDF("doc_id", "text")
    val rows = Dedup.simhashNearDupPairs(dups, "doc_id", "text",
        bits = 48, nBands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == rows.distinct.length)
    assert(rows.map(r => (r._1, r._2)).toSet == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(rows.forall(_._3 == 0))
    // the screen path shares the filter: exact-dup probe flags its base twin
    val scr = Dedup.simhashScreen(dups.filter($"doc_id" =!= 1L), dups.filter($"doc_id" === 1L),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(scr.toSeq == Seq((1L, 2L, 0, 0L)))
  }
}
