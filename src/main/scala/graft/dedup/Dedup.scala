package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** Deduplication operators for training-data pipelines — beyond-reference
  * (builder prompt). Designed for 100 TB: every stage is a shuffle-on-key
  * DataFrame op (groupBy doc hash / band bucket), no driver materialization,
  * no cross joins except within LSH candidate buckets.
  */
object Dedup {

  /** Exact dedup via content hash: one row per distinct text with the
    * canonical (minimum) id and the duplicate count. Single hash-shuffle;
    * at scale this is the cheapest possible exact dedup (hash groupBy with
    * map-side partial aggregation).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Distinct n-token shingles of a text column. Documents shorter than n
    * tokens yield an empty array — without the guard, Spark's
    * `sequence(0, negative)` counts DOWN and emits junk partial grams.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = split(text, " ")
    when(size(t) >= n,
      array_distinct(
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Jaccard similarity of two distinct-element arrays. |A∪B| is derived as
    * |A|+|B|−|A∩B| instead of materializing the union array — one hash-set
    * build per pair instead of two plus an allocation. (Spark's common
    * subexpression elimination computes `array_intersect` once.)
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val denom = size(a) + size(b) - inter
    // guard the empty∩empty pair (round-8): under ANSI mode the 0/0
    // division THROWS, and Catalyst is free to evaluate this expression
    // before the caller's id_a < id_b / size-compatibility conjuncts (it
    // merges post-join filters; observed: a self-pair of an empty-shingle
    // doc reached the division inside a BroadcastHashJoin). J(∅,∅) := 0
    // here — such a pair can never pass a threshold > 0, and no previously
    // succeeding query ever produced one (it would have thrown).
    when(denom > 0, inter / denom).otherwise(lit(0.0))
  }

  /** NECESSARY size condition for J(A,B) ≥ t (round-7; guide §2.3 — do the
    * cheap integer test before the per-pair set intersection): J ≤
    * min(|A|,|B|)/max(|A|,|B|), so J ≥ t forces t·max ≤ min. Evaluated in
    * exact integer arithmetic on the FLOORED 6-dp threshold numerator —
    * floor, never round: an upward-rounded t′ > t would reject a boundary
    * pair the Jaccard filter keeps. A pure pre-filter: every surviving
    * candidate still runs the exact Jaccard test, so results are unchanged.
    */
  private def sizeCompatible(a: Column, b: Column, threshold: Double): Column = {
    val t6 = math.floor(threshold * 1000000L).toLong
    val sa = size(a).cast("long")
    val sb = size(b).cast("long")
    sb * 1000000L >= lit(t6) * sa && sa * 1000000L >= lit(t6) * sb
  }

  /** Near-duplicate pairs by n-gram shingle Jaccard within a blocking key —
    * the BOUNDED-VERIFY primitive: correct whenever the caller can guarantee
    * the blocking key caps block size (a pre-computed LSH bucket, a tenant id
    * with known fan-in). NOT the scale path on an open-ended corpus: a static
    * attribute block grows O(n) ⇒ O(n²) pairs per block. Pipelines
    * (clusters, curation) feed from [[minhashLshPairs]] instead.
    * Output: (id_a, id_b, sim) with id_a < id_b, sim >= threshold.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val withSh = df.select(
      col(idCol).as("id"), col(blockCol).as("block"),
      shingles(col(textCol), n).as("sh"))
    val a = withSh.select(col("id").as("id_a"), col("block"), col("sh").as("sh_a"))
    val b = withSh.select(col("id").as("id_b"), col("block"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .filter(sizeCompatible(col("sh_a"), col("sh_b"), threshold))
      .withColumn("sim", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Leakage-free train/holdout split: assign each document's near-dup
    * CLUSTER — not the document — to a side, so no near-duplicate pair can
    * straddle the boundary (the classic eval-contamination failure mode: a
    * doc-level hash split puts one copy of a near-dup in train and its
    * twin in test, and the "held-out" metric measures memorization).
    * Composition of the existing scale paths: capped-LSH pair generation →
    * connected components → split = pure function of the cluster label via
    * the cross-engine 60-bit md5 hash (RNG-free, layout-independent, the
    * [[graft.text.TextFunctions.hash60]] discipline every sampling op
    * here uses). Singleton docs are their own cluster and split i.i.d.
    * Output: (id, cluster, split) with split ∈ train/holdout.
    */
  def clusterSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int,
      nBands: Int,
      threshold: Double,
      maxBucketSize: Option[Int],
      holdoutPct: Int): DataFrame = {
    require(holdoutPct > 0 && holdoutPct < 100, s"holdoutPct in (0,100): $holdoutPct")
    val pairs = minhashLshPairs(df, idCol, textCol, n, k, nBands, threshold, maxBucketSize)
      .select(col("id_a"), col("id_b"))
    val clusters = connectedComponents(df.select(col(idCol).as("id")), pairs)
    clusters.select(col("id"), col("cluster"),
      when(pmod(graft.text.TextFunctions.hash60(col("cluster").cast("string")),
        lit(100)) < holdoutPct, "holdout").otherwise("train").as("split"))
  }

  /** Directional n-gram CONTAINMENT pairs (Broder 1997 §2's second
    * resemblance measure): c(A→B) = |S(A) ∩ S(B)| / |S(A)| over distinct
    * n-gram shingle sets. Jaccard structurally misses the asymmetric
    * near-dup — a short doc quoted whole inside a much larger one scores
    * J ≈ |A|/|B| ≈ 0 but c(A→B) = 1 — so containment is THE signal for
    * quote/subset detection (it is also the dedup-eval measure in Lee et
    * al. 2022 §4.1).
    *
    * Scale shape: no block cross-join — documents meet on the GRAM axis
    * (explode distinct grams → self-join on gram → pair-count aggregate),
    * so cost is Σ_g df(g)², not |block|². The df(g) ≤ `maxDf` cap bounds
    * the per-gram quadratic term; ultra-common shingles ("of the and"-class
    * boilerplate, which carry no dedup signal — standard stop-shingle
    * practice) are dropped from the gram space BEFORE pairing. The cap also
    * redefines |S(A)| to the informative-gram set — numerator and
    * denominator see the same space, so containment remains a true fraction
    * and the SQL oracle replays the cap exactly. Docs whose informative set
    * is empty pair with nothing.
    *
    * Output: (id_a, id_b, inter, size_a, containment) per DIRECTED pair
    * with containment ≥ threshold — (a,b) and (b,a) are distinct rows with
    * different denominators, by design.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxDf: Int = 5): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("g"))
    // shingles are distinct per doc, so count(*) per gram IS doc frequency
    val informative = grams.join(
      grams.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
        .filter(col("gdf") <= maxDf)
        .select(col("g")),
      Seq("g"))
    val sizes = informative.groupBy(col("id")).agg(count(lit(1)).as("size_a"))
    informative.select(col("g"), col("id").as("id_a"))
      .join(informative.select(col("g"), col("id").as("id_b")), Seq("g"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("id", "id_a"), Seq("id_a"))
      .withColumn("containment", col("inter").cast("double") / col("size_a"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("size_a"),
        col("containment"))
  }

  /** MinHash parameters: k universal-hash functions h_i(x) = (a_i·x + b_i)
    * mod p over the 60-bit shingle hash reduced mod p. Constants are fixed
    * (seeded LCG) so Scala and the SQL oracle share them exactly.
    */
  val MINHASH_P: Long = 2147483647L // 2^31 - 1, Mersenne prime
  def minhashParams(k: Int): Seq[(Int, Long, Long)] = {
    // deterministic params from a tiny LCG; a_i must be non-zero mod p
    var state = 42L
    def next(): Long = { state = (state * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; state }
    (0 until k).map { i =>
      val a = next() % (MINHASH_P - 1) + 1
      val b = next() % MINHASH_P
      (i, a, b)
    }
  }

  /** Per-document MinHash signatures: ONE aggregation with k codegen'd
    * `min` buffers over the exploded shingle rows (round-7 optimization;
    * guide §2.3/§2.4) — each shingle row updates all k minima, so there is
    * no k× crossJoin row blowup and only ONE shuffle, carrying one row of
    * k longs per (partition, id) after partial aggregation. Per-function
    * minima are order-independent, so the output is bit-identical to the
    * old explode × k plan (same (a·x+b) mod p arithmetic).
    * Output: (id, i, minh) — k rows per document (posexploded row-locally).
    */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 16): DataFrame =
    minhashSignaturesWide(df, idCol, textCol, n, k)
      .select(col("id"),
        posexplode(array((0 until k).map(i => col(s"__m$i")): _*)).as(Seq("i", "minh")))

  /** One row per document with the k signature minima as columns
    * (__m0..__m{k-1}) — the single-shuffle core of [[minhashSignatures]];
    * [[bandedSignatures]] derives LSH band keys from it ROW-LOCALLY.
    */
  private[dedup] def minhashSignaturesWide(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int): DataFrame = {
    val tok = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))
      .withColumn("x", pmod(hash60(col("sh")), lit(MINHASH_P)))
    val mins = minhashParams(k).map { case (i, a, b) =>
      min(pmod(lit(a) * col("x") + lit(b), lit(MINHASH_P))).as(s"__m$i")
    }
    tok.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH band signatures derived ROW-LOCALLY from the wide signature frame:
    * (id, band, band_sig) where band_sig is the comma-joined minh string of
    * the band's k/nBands functions in index order — character-identical to
    * the old groupBy(id, band) + sorted collect_list construction, without
    * its second shuffle.
    */
  private[dedup] def bandedSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int,
      nBands: Int): DataFrame = {
    val bandSize = k / nBands
    require(bandSize * nBands == k, s"nBands=$nBands must divide k=$k")
    val sigs = (0 until nBands).map { b =>
      concat_ws(",", (0 until bandSize).map(j =>
        col(s"__m${b * bandSize + j}").cast("string")): _*)
    }
    minhashSignaturesWide(df, idCol, textCol, n, k)
      .select(col("id"), posexplode(array(sigs: _*)).as(Seq("band", "band_sig")))
  }

  /** One-pass custom Aggregator formulation (identical output): all k
    * minima live in one aggregation buffer, so the shuffle input is NOT
    * multiplied by k. Slower than the explode form at local scale (see
    * [[minhashSignatures]]) but the better shape when shuffle volume, not
    * CPU, is the binding constraint.
    */
  def minhashSignaturesAgg(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 16): DataFrame = {
    val sig = graft.functions.MinHashAggregator.column(k, minhashParams(k), MINHASH_P)
    df.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))
      .withColumn("x", pmod(hash60(col("sh")), lit(MINHASH_P)))
      .groupBy(col("id"))
      .agg(sig(col("x")).as("sig"))
      .select(col("id"), posexplode(col("sig")).as(Seq("i", "minh")))
  }

  /** Explode × k hash functions formulation — the measured-fastest local
    * plan shape and the default.
    */
  def minhashSignaturesExploded(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val params = minhashParams(k).toDF("i", "a", "b")
    df.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))
      .withColumn("x", pmod(hash60(col("sh")), lit(MINHASH_P)))
      .crossJoin(broadcast(params))
      .withColumn("h", pmod(col("a") * col("x") + col("b"), lit(MINHASH_P)))
      .groupBy(col("id"), col("i"))
      .agg(min(col("h")).as("minh"))
  }

  /** LSH banding over minhash signatures: documents sharing any band's full
    * signature become candidate pairs. bandsize = k / nBands rows per band.
    * Output: (id_a, id_b) distinct candidate pairs. The self-join is per
    * (band, band_sig) bucket — bounded, shuffle-on-bucket, no cross join.
    */
  def lshCandidates(signatures: DataFrame, nBands: Int, k: Int): DataFrame =
    lshCandidates(signatures, nBands, k, maxBucketSize = None)

  /** LSH banding with an optional HOT-BUCKET CAP: buckets whose population
    * exceeds `maxBucketSize` never enter the all-pairs self-join. At corpus
    * scale a handful of degenerate band signatures (boilerplate, empty
    * docs) can hold O(corpus) members — a quadratic bomb on one shuffle
    * key. Instead of dropping a hot bucket's members outright (measured on
    * this corpus: verified-pair recall collapses from ~97% at sf0.01 to
    * 0.33% at sf0.1, because almost every true pair lives ONLY in
    * mega-buckets), each over-cap bucket contributes STAR candidates — its
    * minimum id as hub paired with every member: O(bucket) work instead of
    * O(bucket²). For the pipelines that consume these candidates
    * (connected-components clustering) connectivity is what matters, not
    * the full pair set: a verified star keeps the bucket's near-dup
    * cluster connected while per-bucket work stays linear. Capped-off
    * bucket count is observable via [[lshBucketSizes]].
    */
  def lshCandidates(signatures: DataFrame, nBands: Int, k: Int,
      maxBucketSize: Option[Int]): DataFrame = {
    val bandSize = k / nBands
    require(bandSize * nBands == k, s"nBands=$nBands must divide k=$k")
    val banded = signatures
      .withColumn("band", (col("i") / bandSize).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("i"), col("minh")))),
        x => x.getField("minh").cast("string")), ",").as("band_sig"))
    lshCandidatesFromBanded(banded, maxBucketSize)
  }

  /** Candidate generation over a prebuilt (id, band, band_sig) frame — the
    * shared tail of [[lshCandidates]]; [[minhashLshPairs]] feeds it from the
    * row-local [[bandedSignatures]] construction instead of the exploded
    * signature frame (one shuffle fewer).
    */
  private[dedup] def lshCandidatesFromBanded(banded0: DataFrame,
      maxBucketSize: Option[Int]): DataFrame = {
    val pairs = maxBucketSize match {
      case Some(cap) =>
        // pin on the bucket keys: the population stats groupBy, the stats
        // joins, and the within-cap self-join are all keyed
        // (band, band_sig), so this single pinned exchange serves every
        // stage — and keeps the expansion off the AQE-coalesced single
        // partition (Par.pinned); per-bucket work is cap-bounded, so no
        // further salting is needed here
        val banded = graft.ops.Par.pinned(banded0, col("band"), col("band_sig"))
        // one extra count-shuffle on the same key the join shuffles on
        val sizes = banded.groupBy(col("band"), col("band_sig"))
          .agg(count(lit(1)).as("__bucket_n"), min(col("id")).as("__hub"))
        val kept = banded.join(
          sizes.filter(col("__bucket_n") <= cap).select(col("band"), col("band_sig")),
          Seq("band", "band_sig"))
        val a = kept.select(col("id").as("id_a"), col("band"), col("band_sig"))
        val b = kept.select(col("id").as("id_b"), col("band"), col("band_sig"))
        val full = a.join(b, Seq("band", "band_sig"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
        // hub-star candidates for the over-cap buckets: hub = min id < every
        // other member, so (hub, id) is already in canonical order
        val stars = banded.join(
          sizes.filter(col("__bucket_n") > cap).select(col("band"), col("band_sig"), col("__hub")),
          Seq("band", "band_sig"))
          .filter(col("id") =!= col("__hub"))
          .select(col("__hub").as("id_a"), col("id").as("id_b"))
        full.unionByName(stars)
      case None =>
        // UNCAPPED: a degenerate mega-bucket's quadratic expansion would run
        // as one straggler task — triangle-split it like
        // [[simhashNearDupPairs]] (deterministic pmod(id, g) grid; every
        // pair joins in exactly one of the g² cells)
        val spark = banded0.sparkSession
        import spark.implicits._
        val g = SELF_JOIN_SPLIT
        val gDf = (0 until g).map(_.toLong).toList
        val a = graft.ops.Par.pinned(
          banded0.select(col("id").as("id_a"), col("band"), col("band_sig"))
            .withColumn("ga", pmod(col("id_a"), lit(g.toLong)))
            .crossJoin(broadcast(gDf.toDF("gb"))),
          col("band"), col("band_sig"), col("ga"), col("gb"))
        val b = graft.ops.Par.pinned(
          banded0.select(col("id").as("id_b"), col("band"), col("band_sig"))
            .withColumn("gb", pmod(col("id_b"), lit(g.toLong)))
            .crossJoin(broadcast(gDf.toDF("ga"))),
          col("band"), col("band_sig"), col("ga"), col("gb"))
        a.join(b, Seq("band", "band_sig", "ga", "gb"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
    }
    pairs.distinct()
  }

  /** Bucket-population histogram for cap tuning: (band, band_sig, n). */
  def lshBucketSizes(signatures: DataFrame, nBands: Int, k: Int): DataFrame = {
    val bandSize = k / nBands
    require(bandSize * nBands == k, s"nBands=$nBands must divide k=$k")
    signatures
      .withColumn("band", (col("i") / bandSize).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("i"), col("minh")))),
        x => x.getField("minh").cast("string")), ",").as("band_sig"))
      .groupBy(col("band"), col("band_sig"))
      .agg(count(lit(1)).as("n"))
  }

  /** MinHash-LSH near-dup detection end to end: signatures → banded
    * candidates → exact Jaccard verify on the candidates only.
    *
    * `maxBucketSize` engages the hot-bucket cap of [[lshCandidates]] — the
    * flagship cluster/curation pipelines pass it so one degenerate band
    * signature can never turn into an O(bucket²) single-key shuffle bomb.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 16,
      nBands: Int = 4,
      threshold: Double = 0.5,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val cands = lshCandidatesFromBanded(
      bandedSignatures(df, idCol, textCol, n, k, nBands), maxBucketSize)
    // measured: letting Catalyst pick the join strategy here beats forcing
    // broadcast (the array payloads make broadcast hash probes slower than
    // the partitioned join at this shape)
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    cands
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .filter(sizeCompatible(col("sh_a"), col("sh_b"), threshold))
      .withColumn("sim", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Connected components over the near-duplicate pair graph — the final
    * step of a real dedup pipeline (one canonical doc per cluster).
    * Iterative min-label propagation: each node repeatedly adopts the
    * minimum label among itself and its neighbors until fixpoint — the
    * standard large-scale CC algorithm (hash-partitioned joins, no driver
    * graph). Converges in O(component diameter) rounds; near-dup clusters
    * are dense, so a handful. Throws if `maxIters` is hit unconverged.
    *
    * @param nodes DataFrame with an `id` column (every doc, incl. singletons)
    * @param pairs DataFrame with `id_a`, `id_b` edges
    * @return (id, cluster) where cluster = min id reachable
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame, maxIters: Int = 20): DataFrame =
    connectedComponentsFrom(
      nodes.select(col("id"), col("id").as("cluster")), pairs, maxIters)

  /** [[connectedComponents]] from a SEEDED labeling (round-8): `seeds` is
    * (id, cluster) where every seed label is the id of a node in the same
    * component with label ≤ id (the trivial cluster = id always qualifies;
    * a previous converged clustering qualifies by construction). Min-label
    * propagation from any valid seed converges to the SAME fixpoint — the
    * component-wide min id — because labels only decrease and every
    * non-fixpoint state has a decreasing step; starting closer to the
    * fixpoint just removes rounds. Measured on the incremental gates: the
    * id-seeded run re-derives the entire base clustering every batch
    * (changed ≈ |base| in round 1), the seeded run pays only for the new
    * connectivity.
    */
  def connectedComponentsFrom(seeds: DataFrame, pairs: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val log = org.slf4j.LoggerFactory.getLogger("graft.dedup.CC")
    // symmetrize via explode, NOT union: a self-union would execute the
    // (potentially expensive) pair-generation plan twice before the cache
    // materializes — measured 2x the LSH pipeline cost on the cluster query
    // cache the edges PRE-PARTITIONED on the per-round join key (round-7;
    // guide §2.4 "two operations keyed the same way can share one
    // exchange"): without the pinned repartition every round re-shuffled
    // the full cached edge frame by dst — stage metrics showed two
    // 1.9M-record exchanges per round on the sf0.1 flagship. Partitioned
    // once at cache time, the per-round join needs no edge-side exchange
    // at all.
    val edges = graft.ops.Par.pinned(
      pairs.select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst")),
      col("dst"))
      .cache()
    // materialize the symmetrized frame EAGERLY: the pair-generation plan
    // (banded index + verify — the expensive part) runs exactly once, in
    // its own job, instead of lazily inside round 1's checkpoint job; every
    // round then reads only the cached edges
    val t0 = System.nanoTime()
    val nEdges = edges.count()
    log.info(s"CC: ${nEdges} directed edges materialized in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs")
    // localCheckpoint each round: iterative DataFrame algorithms grow their
    // logical plan exponentially otherwise (every iteration embeds all
    // previous) — lineage truncation is mandatory at any scale
    var labels = seeds.select(col("id"), col("cluster")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val tr = System.nanoTime()
      // candidate label via neighbors: min over (own, neighbors' labels).
      // SHUFFLE_HASH on the labels side (round-7; guide §3.1): the build
      // side is one row per node — always ≤ the edge side — and hashing it
      // per partition beats sort-merge, which re-SORTED the cached edge
      // frame every round; Spark 4's shuffled hash join spills, so the
      // build side need not fit in memory at scale.
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("cluster", "nlbl")
          .hint("shuffle_hash"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nlbl")).as("minNeighbor"))
      val afterMin = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), col("cluster").as("old"),
          least(col("cluster"), coalesce(col("minNeighbor"), col("cluster"))).as("cluster"))
      // pointer-doubling shortcut (label ← label(label)): every node's
      // label is the id of a node in its own component with label(x) ≤ x
      // invariant, so chasing one hop stays in-component and only
      // decreases — collapses the propagation tail from O(diameter) to
      // O(log diameter) rounds (round-4 instrumentation showed a 4-round
      // tail of <100 stragglers on the sf0.1 flagship graph). The parent
      // lookup joins the labels frame against itself — the SMALL axis
      // (one row per node), not the edge frame.
      val parents = afterMin.select(col("id").as("__pid"), col("cluster").as("__plbl"))
      // carry a change flag through the checkpoint: counting changes is then
      // a filter on materialized data, not another join against old labels
      val updated = afterMin
        .join(parents, afterMin("cluster") === col("__pid"), "left")
        .select(col("id"),
          coalesce(col("__plbl"), col("cluster")).as("cluster"),
          (coalesce(col("__plbl"), col("cluster")) < col("old")).as("chg"))
        .localCheckpoint(true)
      val changed = updated.filter(col("chg")).count()
      labels = updated.select(col("id"), col("cluster"))
      converged = changed == 0
      iter += 1
      log.info(f"CC round $iter: changed=$changed, " +
        f"${(System.nanoTime() - tr) / 1e9}%.1fs")
    }
    edges.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIters iterations")
    labels
  }

  /** Incremental CC maintenance — the 100 TB answer to "a new crawl batch
    * arrived, update the dedup clusters" without re-clustering the corpus:
    * every EXISTING component enters the propagation as its STAR (one
    * id → cluster edge per labeled node — already one hop from converged),
    * so the rounds pay for the new connectivity only, never the base
    * graph's full pair set (2.9M pairs vs 5k star edges on the sf0.1
    * flagship — a 580× edge-frame cut). Identity (spec-proven):
    * CC(star(CC(E)) ∪ E_new) = CC(E ∪ E_new), so the output is exactly
    * the full-graph min-label clustering.
    *
    * @param labels existing (id, cluster) labeling — CC output
    * @param newNodes ids arriving in this batch (an `id` column)
    * @param newEdges verified near-dup pairs touching the batch
    *   (`id_a`, `id_b` — new↔base and new↔new)
    */
  def incrementalComponents(labels: DataFrame, newNodes: DataFrame,
      newEdges: DataFrame, maxIters: Int = 20): DataFrame = {
    val star = labels.filter(col("id") =!= col("cluster"))
      .select(col("id").as("id_a"), col("cluster").as("id_b"))
    // SEED the propagation with the existing labels (round-8): the base
    // side starts already-converged, so rounds pay only for the merges the
    // new edges introduce instead of re-deriving every base cluster from
    // scratch (min-merge on id dedups a node arriving both as labeled base
    // and batch member, keeping the smaller = previous label). Same
    // fixpoint as id-seeding — see [[connectedComponentsFrom]].
    val seeds = labels.select(col("id"), col("cluster"))
      .unionByName(newNodes.select(col("id"), col("id").as("cluster")))
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
    connectedComponentsFrom(seeds,
      star.unionByName(newEdges.select(col("id_a"), col("id_b"))), maxIters)
  }

  /** SimHash near-duplicate pairs via the banded multi-index: split the
    * signature into `nBands` bit-bands; by pigeonhole, any pair within
    * `maxHamming` (< nBands) differing bits shares at least one band
    * EXACTLY — so banding has guaranteed recall, unlike MinHash-LSH's
    * probabilistic bands. Candidates join per (band, band-bits) bucket;
    * verify is a single `bit_count(xor)` — integer ops, no arrays.
    * Default 48 bits keeps every value positive (no sign-bit popcount
    * ambiguity across engines). Output: (id_a, id_b, hamming).
    */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 48,
      nBands: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < nBands,
      s"pigeonhole guarantee needs maxHamming ($maxHamming) < nBands ($nBands)")
    require(bits % nBands == 0, s"nBands=$nBands must divide bits=$bits")
    val spark = df.sparkSession
    import spark.implicits._
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    val sigs = simhash(df, idCol, textCol, bits)
    val banded = sigs.crossJoin(broadcast((0 until nBands).toDF("band")))
      .withColumn("bkey", expr(s"shiftright(simhash, band * $bandBits) & $mask"))
    // triangle-split self-join (round-7; guide §2.5 skew): each side is
    // salted with a deterministic pmod(id, g) grid cell — side a fixes
    // ga = id_a mod g and enumerates gb, side b the reverse — so every
    // (a, b) pair joins in EXACTLY ONE of the g² cells and a hot bucket's
    // quadratic expansion spreads over g² tasks instead of one straggler
    // (measured: a 92 s taskMax on the sf0.1 flagship without it). The
    // pinned 4-key partitioning also keeps AQE from coalescing the tiny
    // pre-expansion exchanges into a single partition.
    val g = SELF_JOIN_SPLIT
    val gDf = (0 until g).map(_.toLong).toList
    val a = graft.ops.Par.pinned(
      banded.select(col("id").as("id_a"), col("simhash").as("sig_a"), col("band"), col("bkey"))
        .withColumn("ga", pmod(col("id_a"), lit(g.toLong)))
        .crossJoin(broadcast(gDf.toDF("gb"))),
      col("band"), col("bkey"), col("ga"), col("gb"))
    val b = graft.ops.Par.pinned(
      banded.select(col("id").as("id_b"), col("simhash").as("sig_b"), col("band"), col("bkey"))
        .withColumn("gb", pmod(col("id_b"), lit(g.toLong)))
        .crossJoin(broadcast(gDf.toDF("ga"))),
      col("band"), col("bkey"), col("ga"), col("gb"))
    a.join(b, Seq("band", "bkey", "ga", "gb"))
      .filter(col("id_a") < col("id_b"))
      .filter(firstMatchingBand(col("band"), col("sig_a"), col("sig_b"), bandBits, nBands))
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming")).distinct()
  }

  /** Grid size of the salted self-join split: hot-bucket work divides by
    * g², input rows multiply by g (tiny frames). 8 splits the worst
    * measured bucket ~64× while keeping the enumerated side trivial.
    */
  private val SELF_JOIN_SPLIT = 8

  /** TRUE iff `band` is the FIRST band whose keys match between the two
    * narrow (single-BIGINT) signatures — row-local pre-dedup of banded
    * candidates BEFORE the distinct exchange (round-8; guide §2.3 "shuffle
    * fewer bytes"): a pair within maxHamming of a near-dup corpus shares
    * ~all nBands bands, so the candidate join otherwise emits ≈nBands
    * copies of every pair into the distinct's shuffle (measured on the
    * sf0.1 clusters head: 28.9M rows shuffled into distinct for 1.2M out).
    * Both full signatures ride the joined row, so "j matches" is a pure
    * integer test on their XOR; keeping only the first matching band emits
    * each (pair, orientation) exactly once. Recall is unchanged: the
    * joined band itself matches, so a first matching band always exists
    * and that copy survives. The later `.distinct()` stays as the
    * orientation/safety net, now over ~nBands× fewer rows.
    */
  private def firstMatchingBand(band: Column, sigA: Column, sigB: Column,
      bandBits: Int, nBands: Int): Column = {
    val x = sigA.bitwiseXOR(sigB)
    val mask = (1L << bandBits) - 1
    (0 until nBands).map { j =>
      band <= lit(j) || (shiftright(x, j * bandBits).bitwiseAND(lit(mask)) =!= lit(0L))
    }.reduce(_ && _)
  }

  /** [[firstMatchingBand]] for WIDE (array-of-words) signatures: band j
    * matches iff word j is equal — one word per band by construction.
    */
  private def firstMatchingBandWide(band: Column, sigA: Column, sigB: Column,
      nBands: Int): Column =
    (0 until nBands).map { j =>
      band <= lit(j) || (element_at(sigA, j + 1) =!= element_at(sigB, j + 1))
    }.reduce(_ && _)

  /** Incremental ingest screen: probe a NEW batch against a BASE corpus for
    * SimHash near-dups, comparing neither base-to-base nor batch-to-batch.
    *
    * This is the asymmetric shape real ingest needs: at scale the base's
    * banded signature index is materialized ONCE (bucketed by (band, bkey))
    * and each arriving batch only hashes and probes itself — per-batch cost
    * is O(|batch| · nBands) probe rows against a bucketed index, never a
    * rescan of the base; recall within `maxHamming` is pigeonhole-exact
    * when maxHamming < nBands, same as [[simhashNearDupPairs]].
    *
    * Output per flagged batch doc: (id, n_matches, min_hamming, match_id)
    * where match_id is the LOWEST base id at the minimum hamming — the
    * (hamming, id) pair is min-reduced through one integer encoding so the
    * tie-break is deterministic in a single decomposable aggregate.
    */
  def simhashScreen(
      base: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 48,
      nBands: Int = 12,
      maxHamming: Int = 11): DataFrame =
    screenAgainstIndex(
      simhashBandedIndex(base, idCol, textCol, bits, nBands),
      batch, idCol, textCol, bits, nBands, maxHamming)

  /** The base corpus's banded signature index — (base_id, sig_b, band,
    * bkey). Build (and cache/materialize) ONCE; probe every arriving batch
    * against it with [[screenAgainstIndex]].
    */
  def simhashBandedIndex(
      base: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 48,
      nBands: Int = 12): DataFrame = {
    require(bits % nBands == 0, s"nBands=$nBands must divide bits=$bits")
    val spark = base.sparkSession
    import spark.implicits._
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    graft.ops.Par.pinned(
      simhash(base, idCol, textCol, bits)
        .crossJoin(broadcast((0 until nBands).toDF("band")))
        .withColumn("bkey", expr(s"shiftright(simhash, band * $bandBits) & $mask")),
      col("band"), col("bkey"))
      .select(col("id").as("base_id"), col("simhash").as("sig_b"),
        col("band"), col("bkey"))
  }

  /** Probe a batch against a prebuilt [[simhashBandedIndex]]. */
  def screenAgainstIndex(
      index: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 48,
      nBands: Int = 12,
      maxHamming: Int = 11): DataFrame = {
    require(maxHamming < nBands,
      s"pigeonhole guarantee needs maxHamming ($maxHamming) < nBands ($nBands)")
    require(bits % nBands == 0, s"nBands=$nBands must divide bits=$bits")
    val spark = batch.sparkSession
    import spark.implicits._
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    val ENC = 1000000000000L // hamming ≤ 63 ≪ 10¹², ids < 10¹² by contract
    val probe = graft.ops.Par.pinned(
      simhash(batch, idCol, textCol, bits)
        .crossJoin(broadcast((0 until nBands).toDF("band")))
        .withColumn("bkey", expr(s"shiftright(simhash, band * $bandBits) & $mask")),
      col("band"), col("bkey"))
      .select(col("id"), col("simhash").as("sig_n"), col("band"), col("bkey"))
    verifyScreenMatches(probe.join(index, Seq("band", "bkey"))
      .filter(firstMatchingBand(col("band"), col("sig_n"), col("sig_b"), bandBits, nBands)),
      maxHamming)
  }

  /** Shared screen tail: matched (id, sig_n, base_id, sig_b) candidate rows
    * → hamming verify → per-batch-doc (n_matches, min_hamming, match_id)
    * with the deterministic (hamming, id) min-encoding tie-break.
    */
  private def verifyScreenMatches(matched: DataFrame, maxHamming: Int): DataFrame = {
    val ENC = 1000000000000L // hamming ≤ 63 ≪ 10¹², ids < 10¹² by contract
    matched
      // enforce the id contract at runtime: an out-of-range base_id would
      // silently corrupt the (hamming, id) min-encoding tie-break below —
      // fail the job instead
      .withColumn("base_id",
        when(col("base_id") >= 0 && col("base_id") < ENC, col("base_id"))
          .otherwise(raise_error(concat(
            lit(s"screenAgainstIndex: base id "), col("base_id").cast("string"),
            lit(s" outside [0, $ENC) breaks the min-encoding contract")))))
      .withColumn("hamming", expr("bit_count(sig_n ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id"), col("base_id"), col("hamming")).distinct()
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_matches"),
        min(col("hamming") * ENC + col("base_id")).as("__e"))
      .select(
        col("id"),
        col("n_matches"),
        expr(s"__e div $ENC").cast("int").as("min_hamming"),
        pmod(col("__e"), lit(ENC)).as("match_id"))
  }

  /** Persist the banded signature index as an on-disk BUCKETED table,
    * hash-bucketed on the combined band key `bk = band·2^bandBits + bkey`
    * (injective in (band, bkey), so a join on `bk` alone is exact) — the
    * cross-JOB layout the incremental screen needs at 100 TB: the base
    * corpus is hashed and banded ONCE, lives on disk, and every future
    * probe joins it CO-LOCATED (zero shuffle on either side, asserted by
    * the gate) instead of rebuilding or re-shuffling the index per run.
    * Idempotent per (session, table).
    */
  def persistentBandedIndex(
      base: DataFrame,
      idCol: String,
      textCol: String,
      table: String,
      bits: Int = 48,
      nBands: Int = 12,
      nBuckets: Int = 16): DataFrame = {
    val bandBits = bits / nBands
    graft.sources.PartitionedSink.writeBucketedTable(
      simhashBandedIndex(base, idCol, textCol, bits, nBands)
        .withColumn("bk", col("band") * (1L << bandBits) + col("bkey")),
      "bk", nBuckets, table)
  }

  /** Probe a batch against a [[persistentBandedIndex]] with a co-located
    * join: the batch's probe frame is written bucketed on the same `bk`
    * (the batch is the SMALL side — bucketing it is O(|batch|·nBands)),
    * so the index↔probe join runs with NO shuffle exchange on either side
    * — the on-disk bucket layout IS the join distribution, asserted at
    * runtime (the job fails loudly if a plan change reintroduces a
    * shuffle). Same screen contract and output as [[simhashScreen]].
    */
  def screenAgainstPersistentIndex(
      index: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      probeTable: String,
      bits: Int = 48,
      nBands: Int = 12,
      maxHamming: Int = 11,
      nBuckets: Int = 16): DataFrame = {
    require(maxHamming < nBands,
      s"pigeonhole guarantee needs maxHamming ($maxHamming) < nBands ($nBands)")
    val joined = probeJoinAgainstPersistentIndex(index, batch, idCol, textCol,
      probeTable, bits, nBands, nBuckets)
    require(graft.sources.PartitionedSink.isShuffleFree(joined),
      "persistent-index probe join introduced a shuffle exchange — " +
        "index and probe must be co-bucketed on bk")
    // bk = band·2^bandBits + bkey, so band = bk >> bandBits (row-local)
    val bandBits = bits / nBands
    verifyScreenMatches(joined
      .filter(firstMatchingBand(shiftright(col("bk"), bandBits),
        col("sig_n"), col("sig_b"), bandBits, nBands)),
      maxHamming)
  }

  /** The matched-candidates join of [[screenAgainstPersistentIndex]],
    * exposed so callers can runtime-assert its plan has no shuffle
    * exchange before aggregating.
    */
  def probeJoinAgainstPersistentIndex(
      index: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      probeTable: String,
      bits: Int = 48,
      nBands: Int = 12,
      nBuckets: Int = 16): DataFrame = {
    require(bits % nBands == 0, s"nBands=$nBands must divide bits=$bits")
    val spark = batch.sparkSession
    import spark.implicits._
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    val probe = simhash(batch, idCol, textCol, bits)
      .crossJoin(broadcast((0 until nBands).toDF("band")))
      .withColumn("bkey", expr(s"shiftright(simhash, band * $bandBits) & $mask"))
      .select(col("id"), col("simhash").as("sig_n"),
        (col("band") * (1L << bandBits) + col("bkey")).as("bk"))
    val probeTbl = graft.sources.PartitionedSink.writeBucketedTable(
      probe, "bk", nBuckets, probeTable)
    probeTbl.hint("merge")
      .join(index.select(col("bk"), col("base_id"), col("sig_b")), Seq("bk"))
  }

  /** SimHash-headed Jaccard near-dup pairs: banded SimHash multi-index
    * candidates (guaranteed recall within `maxHamming` by pigeonhole) →
    * exact Jaccard verify at `threshold`, same output contract as
    * [[minhashLshPairs]].
    *
    * THE head for dense-similarity corpora (round-3 measurement, this
    * repo's documents table at J≥0.9): pair recall 100% vs brute force at
    * sf0.01 AND sf0.1, a strict superset of the MinHash-LSH head's pairs,
    * and identical connected components — where the capped MinHash head
    * oversegments (46.7% label agreement at sf0.1) because almost every
    * true pair lives only in degenerate mega-buckets. The trade: band keys
    * are `bits/nBands` wide, so random-collision candidate volume scales
    * as n²·nBands/2^(bits/nBands) — with 48 bits and h≤11 that is n²·12/16,
    * right when near-dup density is itself Θ(n²) (the answer is that big),
    * wrong for sparse corpora where [[minhashLshPairs]] with the hot-bucket
    * cap stays linear. Pigeonhole recall caps key width at ~bits/maxHamming
    * regardless of signature width, so wider keys require a smaller hamming
    * FRACTION: for high-threshold (near-exact) corpora use
    * [[simhashWideJaccardPairs]], whose ≥64-bit `array<bigint>` signatures
    * make e.g. 16-bit keys at h/bits ≈ 5% expressible (4096× fewer random
    * collisions). Measured trade-offs: SCALE.md "Wide SimHash signatures".
    */
  def simhashJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 1,
      threshold: Double = 0.9,
      bits: Int = 48,
      nBands: Int = 12,
      maxHamming: Int = 11): DataFrame = {
    val cands = simhashNearDupPairs(df, idCol, textCol, bits, nBands, maxHamming)
      .select("id_a", "id_b")
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    cands
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .filter(sizeCompatible(col("sh_a"), col("sh_b"), threshold))
      .withColumn("sim", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Verified near-dup pairs TOUCHING a batch: exactly
    * `simhashJaccardPairs(known).filter(id_a ∈ batch OR id_b ∈ batch)`,
    * computed WITHOUT the accumulated side's quadratic self-join — the
    * banded probe side is restricted to the batch's rows before the
    * bucket join, so cost is |batch|·(bucket density), never |known|².
    * Pigeonhole recall is preserved (a qualifying pair has ≥1 shared
    * band, and its batch endpoint is on the probe side); both-in-batch
    * pairs appear from both directions and dedupe. This is the
    * incremental-maintenance head: at 100 TB the banded side lives as
    * the persistent bucketed index and this probe is shuffle-free.
    */
  def simhashJaccardPairsTouching(
      known: DataFrame,
      batchIds: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 1,
      threshold: Double = 0.9,
      bits: Int = 48,
      nBands: Int = 12,
      maxHamming: Int = 11): DataFrame =
    touchingFromSigs(simhash(known, idCol, textCol, bits), known, batchIds,
      idCol, textCol, n, threshold, bits, nBands, maxHamming)

  /** [[simhashJaccardPairsTouching]] over PRE-COMPUTED signatures (round-8;
    * guide §2.4 "don't compute things twice"): the streaming incremental-CC
    * gate accumulates each batch's documents — re-deriving simhash for the
    * whole accumulated corpus on EVERY micro-batch re-paid the token
    * explode + `bits`-buffer aggregation for all previously seen docs.
    * `knownSigned` carries a `sigCol` computed ONCE at each doc's arrival
    * (simhash is a pure function of the text, so the stored value is
    * bit-identical to a recompute). Verify still reads the texts.
    */
  def simhashJaccardPairsTouchingPresigned(
      knownSigned: DataFrame,
      batchIds: DataFrame,
      idCol: String,
      textCol: String,
      sigCol: String,
      n: Int = 1,
      threshold: Double = 0.9,
      bits: Int = 48,
      nBands: Int = 12,
      maxHamming: Int = 11): DataFrame =
    touchingFromSigs(
      knownSigned.select(col(idCol).as("id"), col(sigCol).as("simhash")),
      knownSigned, batchIds, idCol, textCol, n, threshold, bits, nBands, maxHamming)

  private def touchingFromSigs(
      sigs: DataFrame,
      known: DataFrame,
      batchIds: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      bits: Int,
      nBands: Int,
      maxHamming: Int): DataFrame = {
    require(maxHamming < nBands, s"pigeonhole needs maxHamming ($maxHamming) < nBands ($nBands)")
    require(bits % nBands == 0, s"nBands=$nBands must divide bits=$bits")
    val spark = known.sparkSession
    import spark.implicits._
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    val banded = graft.ops.Par.pinned(
      sigs.crossJoin(broadcast((0 until nBands).toDF("band")))
        .withColumn("bkey", expr(s"shiftright(simhash, band * $bandBits) & $mask")),
      col("band"), col("bkey"))
    val ids = batchIds.select(col(batchIds.columns.head).as("id"))
    val probe = banded.join(ids, Seq("id"), "left_semi")
      .select(col("id").as("id_x"), col("simhash").as("sig_x"), col("band"), col("bkey"))
    val index = banded
      .select(col("id").as("id_y"), col("simhash").as("sig_y"), col("band"), col("bkey"))
    val cands = probe.join(index, Seq("band", "bkey"))
      .filter(col("id_x") =!= col("id_y"))
      .filter(firstMatchingBand(col("band"), col("sig_x"), col("sig_y"), bandBits, nBands))
      .filter(expr("bit_count(sig_x ^ sig_y)") <= maxHamming)
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
    val sh = known.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    cands
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .filter(sizeCompatible(col("sh_a"), col("sh_b"), threshold))
      .withColumn("sim", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** 32-bit SimHash over tokens: bit b of the signature is the sign of
    * Σ_tokens (±1 depending on bit b of the token's 60-bit hash).
    *
    * ONE aggregation, `bits` conditional-sum buffers (round-7 optimization;
    * guide §2.3 "shuffle fewer bytes" / §2.4 "remove shuffles outright"):
    * the previous shape exploded tokens × `bits` positions through a
    * broadcast crossJoin and paid TWO hash aggregations ((id, b) then id) —
    * a bits× row blowup whose partial-aggregate hashmap saw bits×|tokens|
    * updates. Here each token row updates `bits` codegen'd sum buffers of
    * one groupBy(id), so the shuffle carries one row of `bits` longs per
    * (partition, id) and the bit-assembly is a row-local projection.
    * Per-bit integer sums are order-independent — output is bit-identical
    * to the old plan (same md5-derived ±1 contributions, same sign rule).
    * Output: (id, simhash).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 32): DataFrame = {
    val tok = df
      .select(col(idCol).as("id"), explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .withColumn("th", hash60(col("tok")))
    val sums = (0 until bits).map { b =>
      sum(when(shiftright(col("th"), b) % 2 === 1, 1).otherwise(-1)).as(s"__s$b")
    }
    tok.groupBy(col("id")).agg(sums.head, sums.tail: _*)
      .select(col("id"),
        (0 until bits).map(b =>
          when(col(s"__s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** WIDE SimHash: the signature as `array<bigint>` with ONE WORD PER BAND
    * (word `w` holds conceptual bits [w·bandBits, (w+1)·bandBits), each word
    * ≤ 63 bits so it stays non-negative). This lifts the single-BIGINT
    * 63-bit ceiling: `bits` = 96/128/… is now expressible, which is the
    * production mitigation for the banded head's random-collision growth
    * (candidate volume ∝ n²·nBands/2^(bits/nBands) — widening `bits` at
    * fixed `nBands` divides it by 2^(Δbits/nBands); see SCALE.md).
    *
    * Aligning words with bands makes the representation free to index:
    * band-key extraction is `element_at(sig, band+1)` (no shifts), and
    * hamming is Σ_w bit_count(w_a xor w_b) via `zip_with` + `aggregate` —
    * still pure codegen'd integer ops, no UDF. For the same `bits`/`nBands`
    * the per-band keys and hamming distances equal [[simhash]]-derived ones
    * exactly (spec-verified), so narrow and wide heads are interchangeable.
    * Output: (id, simhash: array<bigint> of length nBands).
    */
  def simhashWide(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 96,
      nBands: Int = 12): DataFrame = {
    require(bits % nBands == 0, s"nBands=$nBands must divide bits=$bits")
    val bandBits = bits / nBands
    require(bandBits <= 60, s"band width $bandBits exceeds 60 bits (raise nBands)")
    // hash60 yields 60 independent bits per token — conceptual bit b draws
    // from hash CHUNK k = b/60 at position b%60, where chunk 0 is the plain
    // token hash (so any bits ≤ 60 prefix agrees with [[simhash]] exactly)
    // and chunk k > 0 salts the token with "k#".
    //
    // ONE aggregation with `bits` conditional-sum buffers (round-7
    // optimization, same rewrite as [[simhash]]): the previous shape paid a
    // bits× crossJoin row blowup and THREE shuffles ((id,b) → (id,w) → id
    // with a collect_list sort); per-bit integer sums are order-independent
    // and the word assembly is a row-local projection, so the output is
    // bit-identical.
    val nChunks = (bits + 59) / 60
    val withH = (0 until nChunks).foldLeft(
      df.select(col(idCol).as("id"), explode(array_distinct(split(col(textCol), " "))).as("tok"))
    ) { (d, k) =>
      d.withColumn(s"__th$k",
        if (k == 0) hash60(col("tok")) else hash60(concat(lit(s"$k#"), col("tok"))))
    }
    val sums = (0 until bits).map { b =>
      val (k, p) = (b / 60, b % 60)
      sum(when(shiftright(col(s"__th$k"), p) % 2 === 1, 1).otherwise(-1)).as(s"__s$b")
    }
    val words = (0 until nBands).map { w =>
      (0 until bandBits).map { j =>
        val b = w * bandBits + j
        when(col(s"__s$b") > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    withH.groupBy(col("id")).agg(sums.head, sums.tail: _*)
      .select(col("id"), array(words: _*).as("simhash"))
  }

  /** Near-duplicate candidate pairs over [[simhashWide]] signatures — the
    * ≥64-bit scale path of [[simhashNearDupPairs]], same pigeonhole recall
    * guarantee (any pair within `maxHamming` < `nBands` differing bits
    * shares at least one full band/word). Banding is `posexplode` over the
    * signature words; verify is Σ bit_count(xor) over zipped words.
    * Output: (id_a, id_b, hamming).
    */
  def simhashWideNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 96,
      nBands: Int = 12,
      maxHamming: Int = 11): DataFrame = {
    require(maxHamming < nBands,
      s"pigeonhole guarantee needs maxHamming ($maxHamming) < nBands ($nBands)")
    val sigs = simhashWide(df, idCol, textCol, bits, nBands)
    val banded = graft.ops.Par.pinned(
      sigs.select(col("id"), col("simhash"),
        posexplode(col("simhash")).as(Seq("band", "bkey"))),
      col("band"), col("bkey"))
    val a = banded.select(col("id").as("id_a"), col("simhash").as("sig_a"), col("band"), col("bkey"))
    val b = banded.select(col("id").as("id_b"), col("simhash").as("sig_b"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .filter(firstMatchingBandWide(col("band"), col("sig_a"), col("sig_b"), nBands))
      .withColumn("hamming",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming")).distinct()
  }

  /** [[simhashJaccardPairs]] with the wide (≥64-bit-capable) head: wide
    * banded candidates → exact Jaccard verify. Same output contract; the
    * flagship cluster/curation pipelines can swap heads without any other
    * plan change.
    */
  def simhashWideJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 1,
      threshold: Double = 0.9,
      bits: Int = 96,
      nBands: Int = 12,
      maxHamming: Int = 11): DataFrame = {
    val cands = simhashWideNearDupPairs(df, idCol, textCol, bits, nBands, maxHamming)
      .select("id_a", "id_b")
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    cands
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .filter(sizeCompatible(col("sh_a"), col("sh_b"), threshold))
      .withColumn("sim", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }
}
