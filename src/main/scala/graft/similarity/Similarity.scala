package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) —
  * beyond-reference operators (builder prompt). Brute-force cosine top-k as
  * the exactness baseline; sign-random-projection LSH bucketing as the scale
  * path (candidates only within buckets — turns the O(N·Q) scan into
  * O(N·Q/2^bits) per bucket at 100 TB).
  *
  * All arithmetic is double-precision sequential sums via
  * `functions.aggregate`/`zip_with` (codegen'd, no UDFs) so the DuckDB
  * oracle (`list_dot_product` on DOUBLE lists) matches bit-for-bit at
  * 6-decimal rounding.
  */
object Similarity {

  /** Element-wise double cast (embeddings are float; cross-engine float
    * summation differs, doubles don't at these magnitudes).
    */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Composed-builtin cosine (zip_with + aggregate) — reference semantics. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused single-pass cosine via the custom Catalyst expression
    * ([[graft.functions.CosineSimilarity]]) — same sequential double math,
    * no intermediate array, inlined in whole-stage codegen. Callers must
    * register once per session; the operators below do it for you.
    */
  def cosineFast(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineSim(a, b)

  /** Scale-safe per-query top-k (round 3): a naive
    * `Window.partitionBy(query_id)` rank sorts each query's ENTIRE
    * candidate set in one task — a corpus-sized single-task sort when the
    * candidates are the whole corpus (brute force) or a constant fraction
    * of it (LSH/IVF buckets at 100 TB). Two stages instead, the same shape
    * as the AUC rank statistics: a salted local rank prunes every
    * (query, hash-slice) to k rows IN PARALLEL, then the exact rank runs
    * over the ≤ salt·k survivors per query. Any true top-k row is top-k
    * within its slice, so the output is IDENTICAL to the naive window —
    * the gates' hashes prove it (they were built on the naive form).
    */
  private val TOPK_SALT = 32
  def topKPerQuery(scored: DataFrame, simCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salt = pmod(hash(col("neighbor_id")), lit(TOPK_SALT))
    val wLocal = Window.partitionBy(col("query_id"), salt)
      .orderBy(col(simCol).desc, col("neighbor_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col(simCol).desc, col("neighbor_id"))
    scored.withColumn("__lr", row_number().over(wLocal))
      .filter(col("__lr") <= k).drop("__lr")
      .withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= k)
  }

  /** Semantic decontamination screen (beyond-reference training-data op):
    * n-gram decontamination ([[graft.text.Decontaminate]]) only catches
    * VERBATIM benchmark overlap — a paraphrased eval item sails through.
    * This screens each corpus embedding against the benchmark embedding
    * set by max cosine similarity and flags everything above a threshold.
    *
    * Scale shape: the benchmark side is fixed-size by definition, so it
    * BROADCASTS and the corpus streams past in one scan; the per-corpus-id
    * argmax is a decomposable `max(struct(sim, bench_id))` aggregate —
    * map-side combined, NOT a window (a window would sort |bench| rows per
    * corpus id; the aggregate combines them). Ties break to the highest
    * bench_id on the 6-dp-rounded score, deterministically.
    *
    * Output: (id, bench_id, max_sim, flagged) for every corpus vector.
    */
  def screenSemantic(corpus: DataFrame, bench: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("cv"))
    val b = bench.select(col(idCol).as("bench_id"), asDouble(col(vecCol)).as("bv"))
    c.crossJoin(broadcast(b))
      .withColumn("sim", round(cosineFast(col("cv"), col("bv")), 6))
      .groupBy(col("id"))
      .agg(max(struct(col("sim"), col("bench_id"))).as("m"))
      .select(col("id"),
        col("m.bench_id").as("bench_id"),
        col("m.sim").as("max_sim"),
        (col("m.sim") >= threshold).as("flagged"))
  }

  /** Exact top-k cosine neighbors of each query vector over the corpus.
    * Query side is expected tiny (broadcast); ranking is per-query with a
    * deterministic tie-break on neighbor id over the 6-dp-rounded score.
    * Output: (query_id, neighbor_id, sim, rnk).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6))
    topKPerQuery(scored, "sim", k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** Hard-negative mining for contrastive/embedding training — for each
    * query vector, the k most similar corpus vectors with a DIFFERENT
    * label (same-label vectors are positives; the near-boundary negatives
    * are the informative training pairs). Composition of the exact top-k
    * machinery with a label-disagreement predicate applied BEFORE ranking,
    * so the per-query rank space only ever contains admissible negatives.
    *
    * Scale shape: identical to [[bruteForceTopK]] — query side broadcasts,
    * corpus streams in one scan, salted two-stage top-k. For corpus-×-corpus
    * mining swap the scored head for the IVF/PQ candidate generators; the
    * label filter and ranking stages are unchanged.
    * Output: (query_id, neighbor_id, sim, rnk).
    */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("qlabel"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("clabel"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("qlabel") =!= col("clabel"))
      .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6))
    topKPerQuery(scored, "sim", k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** Matryoshka funnel retrieval (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): an MRL-trained embedding packs coarse
    * semantics into its PREFIX, so stage 1 scores candidates with the
    * cosine of just the first `prefixDims` coordinates (cosine of the
    * truncated vectors IS the MRL similarity — its own norms renormalize
    * it), shortlists `refine` per query, and stage 2 re-ranks the
    * shortlist with exact full-dimension cosine.
    *
    * Scale shape: the stage-1 scan does prefixDims/dim of the multiply
    * work of brute force over the whole corpus (and at 100 TB the prefix
    * lives as its OWN parquet column so the scan reads prefixDims/dim of
    * the bytes too — column pruning does the rest); stage 2 touches only
    * |queries|·refine rows, joined back to full vectors on the id key.
    * Both ranking stages go through the salted two-stage
    * [[topKPerQuery]]. Output: (query_id, neighbor_id, sim, rnk).
    */
  def mrlTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      prefixDims: Int,
      refine: Int): DataFrame = {
    require(prefixDims > 0, s"prefixDims must be positive: $prefixDims")
    require(refine >= k, s"refine ($refine) must be >= k ($k)")
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(slice(col(vecCol), 1, prefixDims)).as("qp"),
      asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(slice(col(vecCol), 1, prefixDims)).as("cp"),
      asDouble(col(vecCol)).as("cv"))
    val short = topKPerQuery(
      c.select(col("neighbor_id"), col("cp"))
        .crossJoin(broadcast(q.select(col("query_id"), col("qp"))))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("psim", round(cosineFast(col("qp"), col("cp")), 6)),
      "psim", refine)
    val scored = short.select(col("query_id"), col("neighbor_id"))
      .join(c.select(col("neighbor_id"), col("cv")), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))), Seq("query_id"))
      .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6))
    topKPerQuery(scored, "sim", k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** Recall@k of an approximate retrieval head against the exact one —
    * the evaluation operator for the whole ANN family (every production
    * ANN deployment tracks this number). Both inputs are ranked lists
    * (query_id, neighbor_id, rnk); recall is computed over each head's
    * rows with rnk <= k.
    *
    * Scale shape: both inputs are top-k lists — |queries|·k rows by
    * construction — so the hit join and the per-query aggregate are
    * bounded regardless of corpus size. n_true can be < k when the exact
    * head had fewer admissible candidates; recall divides by what the
    * exact head actually returned.
    * Output: (query_id, n_true, n_hit, recall).
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val a = approx.filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    exact.filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"))
      .join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_true"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_true"), 6).as("recall"))
  }

  /** Cluster-balanced sampling — the semantic analog of stratified
    * sampling: strata are LEARNED k-means clusters of the embedding space
    * (topics), and each cluster is capped at the uniform share
    * total/nClusters, so dominant topics downsample and niche topics
    * survive whole (the topic-rebalancing step cluster-aware curation
    * pipelines run between dedup and mixture; same family as SemDeDup's
    * clustering, different decision — balance, not near-dup pruning).
    *
    * rate_c = min(1, (total/nClusters)/n_c); acceptance is the pure
    * content hash (hash60(id) mod 1e6 < floor(rate·1e6)) used by every
    * other sampler — no RNG state, membership stable as the corpus grows.
    * All rate arithmetic is fixed-order IEEE division of exact integers,
    * so the oracle replays it bit-for-bit.
    *
    * Scale shape: centroids via the deterministic distributed Lloyd
    * ([[kmeansCentroids]] — k×dim doubles to the driver); assignment is a
    * map-local argmax over literal centroid arrays (no join); the count
    * frame lives on the |clusters| axis and BROADCASTS back onto the
    * assignment scan. Two corpus passes total (count, then filter).
    * Output: (cluster, n_docs, rate, n_kept) — the report axis; callers
    * wanting the kept rows use the same filter inline.
    */
  def clusterBalance(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      dim: Int,
      iters: Int): DataFrame = {
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    val cents = kmeansCentroids(corpus, vecCol, nLists, dim, iters)
    val assigned = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("dv"))
      .withColumn("cluster", ivfListWith(col("dv"), cents))
      .select(col("id"), col("cluster"))
    val counts = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n_docs"))
    val total = assigned.agg(count(lit(1)).as("total"))
    val rated = counts.crossJoin(total) // one scalar row
      .withColumn("rate_raw", least(lit(1.0),
        col("total").cast("double") / lit(nLists) / col("n_docs")))
      .withColumn("thr", floor(col("rate_raw") * lit(1000000L)).cast("long"))
    val kept = assigned.join(broadcast(rated.select(col("cluster"), col("thr"))),
        Seq("cluster"))
      .filter(pmod(graft.text.TextFunctions.hash60(col("id").cast("string")),
        lit(1000000L)) < col("thr"))
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_kept"))
    rated.join(kept, Seq("cluster"), "left")
      .select(col("cluster"), col("n_docs"),
        round(col("rate_raw"), 6).as("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Deterministic "random" hyperplanes for sign-LSH: plane j, dimension d
    * has component sin(1 + j·dim + d) — fixed, engine-independent, zero-mean
    * across dimensions. Returns an array-of-arrays column expression builder.
    */
  def hyperplane(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d => math.sin(1.0 + j * dim + d))

  /** Sign-random-projection bucket id: bit j = (v · plane_j) > 0.
    * At scale: groupBy(bucket) co-locates likely-similar vectors; queries
    * probe only their own bucket.
    */
  def srpBucket(v: Column, nPlanes: Int, dim: Int): Column = {
    val bits = (0 until nPlanes).map { j =>
      val plane = hyperplane(j, dim)
      val planeCol = array(plane.map(lit): _*)
      when(dot(v, planeCol) > 0, 1L << j).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN: exact cosine top-k but only within each query's SRP
    * bucket. Recall < 1 by construction; the oracle checks determinism, the
    * spec checks recall against brute force.
    * Output: (query_id, neighbor_id, sim, rnk).
    */
  def srpTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int,
      dim: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", srpBucket(col("qv"), nPlanes, dim))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), nPlanes, dim))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6))
    topKPerQuery(scored, "sim", k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** Deterministic IVF coarse centroids: centroid c, dimension d =
    * cos(1 + c·dim + d) — fixed, engine-independent (the IVF analog of the
    * SRP hyperplanes; a production system would k-means these).
    */
  def ivfCentroid(c: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d => math.cos(1.0 + c * dim + d))

  /** Centroid ranking as a sorted array of (−score, index) structs:
    * element 1 is the nearest list, element 2 the runner-up. Linear-size
    * expression — a naive conditional fold duplicates subtrees
    * exponentially (2^nLists) and OOMs codegen; array_sort keeps each dot
    * product computed exactly once. Ties → lowest index (sort by c asc
    * after −score).
    */
  def ivfRanking(v: Column, nLists: Int, dim: Int): Column = {
    val scored = (0 until nLists).map { c =>
      val cent = array(ivfCentroid(c, dim).map(lit): _*)
      struct((-dot(v, cent)).as("negs"), lit(c).as("c"))
    }
    array_sort(array(scored: _*))
  }

  /** IVF list assignment: index of the nearest centroid by dot product
    * (ties → lowest index). Computed map-side; `groupBy(list)` co-locates
    * vectors per inverted list at scale.
    */
  def ivfList(v: Column, nLists: Int, dim: Int): Column =
    element_at(ivfRanking(v, nLists, dim), 1).getField("c")

  /** IVF-bucketed ANN: queries probe their own + the runner-up centroid's
    * inverted lists (nprobe=2), exact cosine top-k within the probed lists.
    * The scale path: corpus scan is replaced by |probed lists| / nLists of
    * the data.
    * Output: (query_id, neighbor_id, sim, rnk).
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int,
      dim: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("list", ivfList(col("cv"), nLists, dim))
    // query probes: best and second-best centroid (nprobe = 2)
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val probes = q0.withColumn("list", ivfList(col("qv"), nLists, dim))
      .unionByName(q0.withColumn("list", ivfSecondList(col("qv"), nLists, dim)))
    val scored = c.join(broadcast(probes), Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6))
      .dropDuplicates("query_id", "neighbor_id")
    topKPerQuery(scored, "sim", k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** Index of the second-nearest centroid (same tie-break discipline). */
  def ivfSecondList(v: Column, nLists: Int, dim: Int): Column =
    element_at(ivfRanking(v, nLists, dim), 2).getField("c")

  /** Centroid ranking against EXPLICIT centroid vectors (learned k-means
    * output) — same array_sort shape and (score desc, index asc) tie rule
    * as [[ivfRanking]].
    */
  def ivfRankingWith(v: Column, cents: Seq[Seq[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (cent, c) =>
      struct((-dot(v, array(cent.map(lit): _*))).as("negs"), lit(c).as("c"))
    }
    array_sort(array(scored: _*))
  }

  def ivfListWith(v: Column, cents: Seq[Seq[Double]]): Column =
    element_at(ivfRankingWith(v, cents), 1).getField("c")

  def ivfSecondListWith(v: Column, cents: Seq[Seq[Double]]): Column =
    element_at(ivfRankingWith(v, cents), 2).getField("c")

  /** ANN SERVING shape: the IVF-encoded corpus persists as a bucketed
    * table on `list` (plus a k×dim centroid side table), so the index is
    * built ONCE and every probe job across processes co-locates against
    * the stored bucket layout — the [[graft.dedup.Dedup.persistentBandedIndex]]
    * discipline applied to vector search. At 100 TB the inverted lists are
    * exactly the artifact an ANN service ships; rebuilding them per query
    * batch (what [[ivfTopKLearned]] does in-process) is the non-starter.
    */
  def persistentIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      table: String,
      nLists: Int,
      dim: Int,
      iters: Int,
      nBuckets: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.VectorExpressions.register(spark)
    import spark.implicits._
    val cents = kmeansCentroids(corpus, vecCol, nLists, dim, iters)
    cents.zipWithIndex.map { case (v, i) => (i, v) }.toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"target/bucketed/${table}_centroids")
    val lists = corpus
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("list", ivfListWith(col("cv"), cents))
    graft.sources.PartitionedSink.writeBucketedTable(lists, "list", nBuckets, table)
  }

  /** Probe a [[persistentIvfIndex]] with a CO-LOCATED join: query vectors
    * assign their top-2 lists from the stored centroids (a bounded k×dim
    * read), the probe frame is written bucketed on the same `list` key
    * (the probe batch is the small side), and the index↔probe join runs
    * with NO shuffle exchange on either side — asserted at runtime. Exact
    * cosine + salted two-stage top-k on the confined candidates, same
    * contract as [[ivfTopKLearned]] (and the same oracle).
    */
  def annAgainstPersistentIndex(
      index: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      table: String,
      probeTable: String,
      k: Int,
      nBuckets: Int = 8): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.VectorExpressions.register(spark)
    val cents: Seq[Seq[Double]] = spark.read
      .parquet(s"target/bucketed/${table}_centroids")
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1)).toSeq
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val probes = q0.withColumn("list", ivfListWith(col("qv"), cents))
      .unionByName(q0.withColumn("list", ivfSecondListWith(col("qv"), cents)))
    val probeDf = graft.sources.PartitionedSink
      .writeBucketedTable(probes, "list", nBuckets, probeTable)
    val joined = index.join(probeDf, Seq("list"))
    require(graft.sources.PartitionedSink.isShuffleFree(joined),
      "persistent IVF probe join introduced a shuffle exchange — " +
        "index and probes must be co-bucketed on list")
    val scored = joined
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6))
      .dropDuplicates("query_id", "neighbor_id")
    topKPerQuery(scored, "sim", k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** Deterministic distributed Lloyd k-means for IVF coarse quantization:
    * trig stand-ins seed the clusters, each iteration assigns by dot
    * product (ties → lowest index) and recomputes centroids as the
    * per-dimension mean of assigned vectors, ROUNDED to 6 dp — the
    * quantization pins the result across summation orders and engines, so
    * the DuckDB oracle can replay the identical iterations. Empty clusters
    * keep their previous centroid. Per iteration: one map-side assignment
    * (literal centroid arrays, no join) + one posexplode aggregation; only
    * k×dim doubles ever reach the driver.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      vecCol: String,
      nLists: Int,
      dim: Int,
      iters: Int): Seq[Seq[Double]] = {
    var cents: Seq[Seq[Double]] = (0 until nLists).map(c => ivfCentroid(c, dim))
    val v = corpus.select(asDouble(col(vecCol)).as("dv"))
    for (_ <- 0 until iters) {
      val rows = v.withColumn("list", ivfListWith(col("dv"), cents))
        .select(col("list"), posexplode(col("dv")).as(Seq("pos", "x")))
        .groupBy(col("list"), col("pos"))
        .agg(round(avg(col("x")), 6).as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val byList = rows.groupBy(_._1)
      cents = (0 until nLists).map { c =>
        byList.get(c) match {
          case Some(ms) => ms.sortBy(_._2).map(_._3).toSeq
          case None     => cents(c)
        }
      }
    }
    cents
  }

  /** IVF ANN over LEARNED coarse centroids (nprobe=2): k-means the corpus,
    * then the same probe-two-lists exact top-k as [[ivfTopK]]. At scale the
    * training pass is a handful of assignment+mean jobs; the centroids ship
    * to every task as literals.
    */
  def ivfTopKLearned(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int,
      dim: Int,
      iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val cents = kmeansCentroids(corpus, vecCol, nLists, dim, iters)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("list", ivfListWith(col("cv"), cents))
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val probes = q0.withColumn("list", ivfListWith(col("qv"), cents))
      .unionByName(q0.withColumn("list", ivfSecondListWith(col("qv"), cents)))
    val scored = c.join(broadcast(probes), Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6))
      .dropDuplicates("query_id", "neighbor_id")
    topKPerQuery(scored, "sim", k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** Embedding-cosine near-duplicate pairs within the SRP bucket — the
    * scale path. Expected bucket population is corpus/2^nPlanes and is
    * tunable with more planes, unlike a static attribute key whose block
    * grows O(n) with the corpus (⇒ O(n²) pairs per block). High-cosine
    * pairs share all plane signs with probability Π_j(1 − θ/π), so recall
    * at a near-dup threshold stays high for small nPlanes.
    */
  def cosineNearDupPairsSrp(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int,
      dim: Int,
      threshold: Double): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("block", srpBucket(col("v"), nPlanes, dim))
    val a = v.select(col("id").as("id_a"), col("block"), col("v").as("va"))
    val b = v.select(col("id").as("id_b"), col("block"), col("v").as("vb"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosineFast(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Embedding-cosine near-duplicate pairs within a STATIC blocking column —
    * the bounded-verify baseline (oracle-checkable, good when the key is
    * known to cap block size). For open-ended corpora use
    * [[cosineNearDupPairsSrp]]: a static key's blocks grow O(n).
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val v = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      asDouble(col(vecCol)).as("v"))
    val a = v.select(col("id").as("id_a"), col("block"), col("v").as("va"))
    // NOTE: measured — broadcasting this self-join side is 4x SLOWER than
    // the shuffle join here (single multi-valued build key per block defeats
    // the hash join); let Catalyst pick
    val b = v.select(col("id").as("id_b"), col("block"), col("v").as("vb"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosineFast(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** SemDeDup (Abbas et al. 2023 — public paper): semantic dedup by
    * clustering the embedding space with the deterministic k-means
    * ([[kmeansCentroids]]) and pruning, within each cluster, every vector
    * whose cosine to a lower-id cluster-mate reaches the threshold.
    *
    * Scale: pairwise work is confined to one cluster, so total comparisons
    * are ~n²/nLists — nLists is the knob, raised with corpus size (the
    * paper uses k in the thousands at web scale) so a cluster stays
    * executor-sized; the one shuffle keys on cluster id and the learned
    * centroids ship to tasks as literals. The keep decision is a
    * min-aggregate + left join — no windows, no driver loops.
    *
    * Semantics are deterministic greedy-by-id: a vector is dropped iff some
    * LOWER-id vector in its cluster (and sub-shard, when capped) is a
    * near-dup. The kept set is therefore guaranteed pairwise non-near-dup
    * within every comparison unit (if a kept pair matched, the higher id
    * would have been dropped) — the spec asserts this invariant.
    *
    * Output: idCol, cluster, dup_of (lowest-id near-dup, −1 if kept), keep.
    */
  def semDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nLists: Int,
      dim: Int,
      iters: Int,
      maxClusterSize: Option[Int] = None): DataFrame = {
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    val cents = kmeansCentroids(corpus, vecCol, nLists, dim, iters)
    val assigned = corpus
      .select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__dv"))
      .withColumn("cluster", ivfListWith(col("__dv"), cents))
    // Hot-cluster cap (same hazard class as an LSH degenerate bucket): a
    // cluster above the cap is sub-sharded by a deterministic content hash
    // so no shuffle key ever exceeds ~cap² comparisons. Pairs straddling
    // sub-shards are not compared — the documented recall trade, taken only
    // on clusters that would otherwise be quadratic bombs. The sizes frame
    // is one row per cluster (broadcast), never corpus-sized.
    val v = maxClusterSize match {
      case None => assigned.withColumn("__sub", lit(0))
      case Some(cap) =>
        val sizes = assigned.groupBy(col("cluster"))
          .agg(count(lit(1)).as("__csize"))
          .withColumn("__nsub",
            ceil(col("__csize") / lit(cap.toDouble)).cast("int"))
          .select(col("cluster"), col("__nsub"))
        assigned.join(broadcast(sizes), Seq("cluster"))
          .withColumn("__sub",
            pmod(graft.text.TextFunctions.hash60(col("__id").cast("string")),
              col("__nsub").cast("long")).cast("int"))
    }
    val a = v.select(col("__id").as("__ida"), col("cluster"), col("__sub"),
      col("__dv").as("__va"))
    val b = v.select(col("__id").as("__idb"), col("cluster"), col("__sub"),
      col("__dv").as("__vb"))
    val dups = a.join(b, Seq("cluster", "__sub"))
      .filter(col("__ida") < col("__idb"))
      .filter(round(cosineFast(col("__va"), col("__vb")), 6) >= threshold)
      .groupBy(col("__idb").as("__id"))
      .agg(min(col("__ida")).as("__dup_of"))
    v.join(dups, Seq("__id"), "left")
      .select(
        col("__id").as(idCol),
        col("cluster"),
        coalesce(col("__dup_of"), lit(-1L)).as("dup_of"),
        col("__dup_of").isNull.cast("int").as("keep"))
  }

  // ---------- Product quantization (PQ / ADC + exact refine, round 3) ----

  /** L2 codeword assignment: argmin ‖x−c‖² = argmin (c·c − 2·x·c) (the x·x
    * term is constant per x), ties → lowest index. Same linear-size
    * array_sort shape as [[ivfRankingWith]]; c·c is computed by the SAME
    * sequential-fold dot both engines use, so the scores replay exactly.
    */
  def l2CodeWith(v: Column, cents: Seq[Seq[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (cent, c) =>
      val ca = array(cent.map(lit): _*)
      struct((dot(ca, ca) - lit(2.0) * dot(v, ca)).as("d2"), lit(c).as("c"))
    }
    element_at(array_sort(array(scored: _*)), 1).getField("c")
  }

  /** Per-subspace PQ codebooks via the same deterministic distributed Lloyd
    * recipe as [[kmeansCentroids]] (trig init offset per subspace, round-6
    * quantized means, empty codes keep the previous word) but with L2
    * assignment — the PQ-standard metric, since a codeword must RECONSTRUCT
    * its subvectors, not just classify them. Returns m × ksub × (dim/m)
    * doubles — driver-tiny, shipped to tasks as literals.
    */
  def pqCodebooks(
      corpus: DataFrame,
      vecCol: String,
      m: Int,
      ksub: Int,
      dim: Int,
      iters: Int): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    (0 until m).map { sub =>
      val v = corpus.select(
        slice(asDouble(col(vecCol)), sub * dsub + 1, dsub).as("dv"))
      var cents: Seq[Seq[Double]] =
        (0 until ksub).map(c => ivfCentroid(sub * ksub + c, dsub))
      for (_ <- 0 until iters) {
        val rows = v.withColumn("code", l2CodeWith(col("dv"), cents))
          .select(col("code"), posexplode(col("dv")).as(Seq("pos", "x")))
          .groupBy(col("code"), col("pos"))
          .agg(round(avg(col("x")), 6).as("m"))
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        val byCode = rows.groupBy(_._1)
        cents = (0 until ksub).map { c =>
          byCode.get(c).map(_.sortBy(_._2).map(_._3).toSeq).getOrElse(cents(c))
        }
      }
      cents
    }
  }

  /** PQ encode: m small codes per vector (array<int>). At rest this is the
    * compressed representation — m bytes-ish per vector instead of 4·dim,
    * the difference between RAM-resident and disk-bound at 100 TB.
    */
  def pqCodes(v: Column, codebooks: Seq[Seq[Seq[Double]]], dim: Int): Column = {
    val m = codebooks.size
    val dsub = dim / m
    array(codebooks.zipWithIndex.map { case (cb, s) =>
      l2CodeWith(slice(v, s * dsub + 1, dsub), cb)
    }: _*)
  }

  /** Codebook reconstruction of a code array: concat of the m codewords. */
  def pqReconstruct(codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    flatten(array(codebooks.zipWithIndex.map { case (cb, s) =>
      element_at(typedlit(cb), element_at(codes, s + 1) + 1)
    }: _*))

  /** PQ ANN with asymmetric-distance candidates + exact refine (the
    * IVFADC refine stage of Jégou et al.'s PQ paper, PAMI 2011): rank the
    * corpus by cosine against each vector's RECONSTRUCTION (reads only the
    * m-byte codes at scan time), keep the top `refine`, then re-rank those
    * few exactly from the raw vectors. The scan side touches compressed
    * codes only; raw vectors are fetched for refine·|queries| rows. Flat
    * scan here — compose with [[ivfTopKLearned]]'s inverted lists for the
    * sub-linear IVFADC layout; both halves are gated separately.
    */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int,
      ksub: Int,
      dim: Int,
      iters: Int,
      refine: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val cb = pqCodebooks(corpus, vecCol, m, ksub, dim, iters)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("code", pqCodes(col("cv"), cb, dim))
      .withColumn("recon", pqReconstruct(col("code"), cb))
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q0), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_adc", round(cosineFast(col("qv"), col("recon")), 6))
    // two-stage ADC candidate cut (corpus-sized), then the exact re-rank
    // runs over only refine·|queries| rows — a plain window is fine there
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    topKPerQuery(scored, "sim_adc", refine).drop("rnk")
      .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  // ---------- IVFADC composition (round 4) ------------------------------

  /** The encoded-corpus half of IVFADC: learned coarse centroids partition
    * the corpus into inverted lists; per-list RESIDUALS (x − centroid) are
    * product-quantized (Jégou et al. PAMI 2011 §IV — residual quantization
    * is what makes m-byte codes accurate, since residual magnitudes are a
    * fraction of vector magnitudes). `recon` is the ADC reconstruction
    * centroid + decode(residual codes) — the only vector the candidate scan
    * reads; the raw vector is touched again only at exact refine.
    * Returns (encoded corpus with list/code/recon, centroids) — exposed so
    * specs can assert scan confinement.
    */
  def ivfadcEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      dim: Int,
      ivfIters: Int,
      m: Int,
      ksub: Int,
      pqIters: Int): (DataFrame, Seq[Seq[Double]]) = {
    val cents = kmeansCentroids(corpus, vecCol, nLists, dim, ivfIters)
    val centLit = typedlit(cents)
    val assigned = corpus
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("list", ivfListWith(col("cv"), cents))
      .withColumn("resid",
        zip_with(col("cv"), element_at(centLit, col("list") + 1), (x, c) => x - c))
    val cb = pqCodebooks(assigned, "resid", m, ksub, dim, pqIters)
    val encoded = assigned
      .withColumn("code", pqCodes(col("resid"), cb, dim))
      .withColumn("recon",
        zip_with(element_at(centLit, col("list") + 1),
          pqReconstruct(col("code"), cb), (c, r) => c + r))
    (encoded, cents)
  }

  /** IVFADC ANN — [[ivfTopKLearned]]'s inverted lists × [[pqTopK]]'s
    * ADC+refine, composed: queries probe their top-2 centroid lists
    * (nprobe=2), the ADC scan ranks ONLY the probed lists' rows by cosine
    * against the m-code reconstruction, the top `refine` survivors are
    * re-ranked exactly from raw vectors. At 100 TB this is the standard
    * sub-linear layout: scan cost is |probed lists|/nLists of the corpus in
    * compressed (m-byte) form, raw vectors are fetched for refine·|queries|
    * rows only. A corpus vector lives in exactly one list and the two
    * probes differ, so no (query, neighbor) duplicates arise — no dedup
    * shuffle needed.
    * Output: (query_id, neighbor_id, sim, rnk).
    */
  def ivfadcTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int,
      dim: Int,
      ivfIters: Int,
      m: Int,
      ksub: Int,
      pqIters: Int,
      refine: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val (encoded, cents) =
      ivfadcEncode(corpus, idCol, vecCol, nLists, dim, ivfIters, m, ksub, pqIters)
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val probes = q0.withColumn("list", ivfListWith(col("qv"), cents))
      .unionByName(q0.withColumn("list", ivfSecondListWith(col("qv"), cents)))
    val scored = encoded.join(broadcast(probes), Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_adc", round(cosineFast(col("qv"), col("recon")), 6))
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    topKPerQuery(scored, "sim_adc", refine).drop("rnk")
      .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  // ---------- SQ8 scalar quantization (round 6) -------------------------

  /** Per-dimension (min, max) train statistics for SQ8 — one corpus
    * aggregate on the dim-bounded position axis, collected as literals
    * (the codebook-as-literal discipline of [[pqCodebooks]]: dim doubles,
    * driver-tiny, shipped into codegen so the encode scan is join-free).
    */
  def sqMinMax(corpus: DataFrame, vecCol: String, dim: Int): (Seq[Double], Seq[Double]) = {
    val rows = corpus
      .select(posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(rows.length == dim, s"expected $dim dims, saw ${rows.length}")
    (rows.map(_._2).toSeq, rows.map(_._3).toSeq)
  }

  /** SQ8 encode: per-dim affine map onto 0..255, floor-quantized —
    * `code_d = min(255, ⌊(x − mn_d)·255 / (mx_d − mn_d)⌋)` (constant dims
    * code 0). One byte per dimension at rest vs 4 for the raw float —
    * the flat-scan compression point between raw vectors and PQ's m-byte
    * codes: no codebook training pass, decode is two flops, and the scan
    * still reads 4× less than raw. Deterministic: the affine map is the
    * same IEEE expression in the DuckDB oracle.
    */
  def sqCodes(v: Column, mins: Seq[Double], maxs: Seq[Double]): Column = {
    val mnL = typedlit(mins)
    val mxL = typedlit(maxs)
    transform(v, (x, i) => {
      val mn = element_at(mnL, i + 1)
      val mx = element_at(mxL, i + 1)
      when(mx === mn, lit(0))
        .otherwise(least(floor((x - mn) * lit(255.0) / (mx - mn)), lit(255.0))
          .cast("int"))
    })
  }

  /** SQ8 decode: `mn_d + code_d·(mx_d − mn_d) / 255` — the reconstruction
    * the ADC candidate scan reads instead of the raw vector.
    */
  def sqReconstruct(codes: Column, mins: Seq[Double], maxs: Seq[Double]): Column = {
    val mnL = typedlit(mins)
    val mxL = typedlit(maxs)
    transform(codes, (c, i) => {
      val mn = element_at(mnL, i + 1)
      val mx = element_at(mxL, i + 1)
      mn + c.cast("double") * (mx - mn) / lit(255.0)
    })
  }

  /** SQ8 ANN: asymmetric-distance candidate scan over the int8
    * reconstructions + exact refine — [[pqTopK]]'s two-stage shape with
    * scalar quantization in place of product codebooks (the FAISS
    * SQ8 flat index). Same salted two-stage top-k; the scan side reads
    * one byte per dimension.
    */
  def sqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      refine: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val (mins, maxs) = sqMinMax(corpus, vecCol, dim)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("code", sqCodes(col("cv"), mins, maxs))
      .withColumn("recon", sqReconstruct(col("code"), mins, maxs))
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q0), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_adc", round(cosineFast(col("qv"), col("recon")), 6))
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    topKPerQuery(scored, "sim_adc", refine).drop("rnk")
      .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }
}
