package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity
import graft.sources.Tables

/** Similarity-search operator queries over `embeddings` (64-dim float
  * vectors): brute-force cosine top-k, SRP-LSH bucketed ANN, and
  * embedding-cosine near-dup pairs. The SRP hyperplane constants are
  * generated once in Scala and interpolated verbatim into the DuckDB oracle
  * so both engines use bit-identical doubles.
  */
object SimilarityQueries extends QueryPack {

  private val DIM = 64
  private val K = 5
  private val PLANES = 4
  private val NLISTS = 8
  private val NEARDUP_THR = 0.25
  private val NQUERIES = 10
  private val SEM_CAP = 100
  private[queries] val SEM_THR = 0.4

  /** PCA gate parameters: 2 components, 8 quantized power iterations. */
  private val PCA_COMPS = 2
  private val PCA_ITERS = 8

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.cached(spark, dir, "embeddings")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_bruteforce" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(
        e.filter(col("vec_id") < NQUERIES), e, "vec_id", "embedding", K)
    }),
    // hybrid retrieval: BM25 lexical top-10 (over the sparse text corpus,
    // queries = residue-5 doc ids) fused with dense cosine top-10 (over
    // the same ids' embeddings) by reciprocal-rank fusion — the standard
    // two-channel retrieval baseline; RRF needs no score normalization,
    // and ids present in only one channel still rank (coalesce to 0)
    "q_hybrid_rrf" -> ((s, dir) => {
      val sparse = graft.dedup.SparseCorpus.generate(
        Tables.cached(s, dir, "documents").select("doc_id"))
      val lex = graft.text.Bm25.retrieveTopK(sparse, "doc_id", "text",
          queryPred = col("doc_id") % 20 === 5, k = 10, maxDfFrac = 0.1)
        .select(col("query_id"), col("doc_id"), col("rnk"))
      val e = emb(s, dir)
      val dense = Similarity.bruteForceTopK(
          e.filter(col("vec_id") % 20 === 5), e, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rnk"))
      graft.similarity.Rrf.fuse(Seq("lex" -> lex, "dense" -> dense),
        kRrf = 60, topK = 10)
    }),
    // Matryoshka funnel: prefix-16 cosine shortlist (coarse MRL prefix),
    // exact full-dim refine on the top-REFINE survivors only
    "q_ann_mrl" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.mrlTopK(
        e.filter(col("vec_id") < NQUERIES), e, "vec_id", "embedding",
        K, MRL_DIMS, REFINE)
    }),
    // recall@k of the SRP-bucketed head against exact brute force — the
    // evaluation operator every production ANN deployment tracks
    "q_ann_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < NQUERIES)
      Similarity.recallAtK(
        Similarity.srpTopK(q, e, "vec_id", "embedding", K, PLANES, DIM),
        Similarity.bruteForceTopK(q, e, "vec_id", "embedding", K), K)
    }),
    // contrastive-training hard negatives: top-k most-similar vectors with
    // a DIFFERENT label per query
    "q_hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.hardNegatives(
        e.filter(col("vec_id") < NQUERIES), e, "vec_id", "embedding", "label", K)
    }),
    "q_ann_srp" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.srpTopK(
        e.filter(col("vec_id") < NQUERIES), e, "vec_id", "embedding", K, PLANES, DIM)
    }),
    // one-pass covariance moments (custom typed Aggregator, no d²-row
    // explode), entries quantized to 6 dp
    "q_pca_covariance" -> ((s, dir) =>
      graft.similarity.Pca.covarianceFrame(emb(s, dir), "embedding", DIM)),
    // learned dimensionality reduction: quantized power-iteration top-2
    // principal directions + row-local projection of every vector
    "q_pca_project" -> ((s, dir) =>
      graft.similarity.Pca.pcaProjections(emb(s, dir), "vec_id", "embedding",
        DIM, PCA_COMPS, PCA_ITERS)
        .withColumnRenamed("id", "vec_id")),
    // whitened projections: unit variance along each kept direction —
    // the pre-ANN normalization for anisotropic clouds
    "q_pca_whiten" -> ((s, dir) =>
      graft.similarity.Pca.whitenedProjections(emb(s, dir), "vec_id", "embedding",
        DIM, PCA_COMPS, PCA_ITERS)
        .withColumnRenamed("id", "vec_id")),
    // PCA-ANN composition: candidates by L2 in the projected space,
    // exact cosine refine on the shortlist only
    "q_ann_pca" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.similarity.Pca.pcaTopK(
        e.filter(col("vec_id") < NQUERIES), e, "vec_id", "embedding",
        K, REFINE, DIM, PCA_COMPS, PCA_ITERS)
    }),
    "q_cosine_neardup" -> ((s, dir) =>
      // SRP-bucket blocking (scale path) — bucket population shrinks with
      // nPlanes instead of growing O(n) like a static attribute block
      Similarity.cosineNearDupPairsSrp(emb(s, dir), "vec_id", "embedding", PLANES, DIM, NEARDUP_THR)),
    "q_ann_ivf" -> ((s, dir) => {
      // learned coarse centroids: deterministic k-means (trig init, round-6
      // quantized updates) replayed identically by the SQL oracle
      val e = emb(s, dir)
      Similarity.ivfTopKLearned(
        e.filter(col("vec_id") < NQUERIES), e, "vec_id", "embedding", K, NLISTS, DIM, KM_ITERS)
    }),
    "q_ann_persistent" -> ((s, dir) => {
      // the SERVING shape: inverted lists live on disk as a bucketed table
      // (built once), probes co-bucket on list and the index<->probe join
      // runs with zero shuffle exchanges (runtime-asserted inside
      // annAgainstPersistentIndex); same semantics + oracle as q_ann_ivf
      val e = emb(s, dir)
      val suffix = math.abs(dir.hashCode)
      val index = Similarity.persistentIvfIndex(
        e, "vec_id", "embedding", s"graft_ivf_index_$suffix", NLISTS, DIM, KM_ITERS)
      Similarity.annAgainstPersistentIndex(
        index, e.filter(col("vec_id") < NQUERIES), "vec_id", "embedding",
        s"graft_ivf_index_$suffix", s"graft_ivf_probe_$suffix", K)
    }),
    "q_semdedup" -> ((s, dir) =>
      // SemDeDup: k-means-clustered embedding space, greedy-by-id pruning
      // of within-cluster near-dups; pairwise work bounded to a cluster,
      // hot clusters sub-sharded at SEM_CAP (inert at sf0.01's ~62-member
      // clusters, active at sf0.1's ~625 — the oracle replays the formula)
      Similarity.semDedup(emb(s, dir), "vec_id", "embedding",
        NEARDUP_THR, NLISTS, DIM, KM_ITERS, maxClusterSize = Some(SEM_CAP))),
    // cluster-balanced sampling: learned-topic strata capped at the
    // uniform share — dominant clusters downsample, niche ones survive
    "q_cluster_balance" -> ((s, dir) =>
      Similarity.clusterBalance(emb(s, dir), "vec_id", "embedding",
        NLISTS, DIM, KM_ITERS)),
    "q_ann_sq" -> ((s, dir) => {
      // SQ8 scalar quantization: per-dim affine int8 codes (train = one
      // dim-bounded min/max aggregate, no codebook iterations), ADC scan
      // over reconstructions + exact refine — the cheap compressed-domain
      // flat path between raw floats and PQ
      val e = emb(s, dir)
      Similarity.sqTopK(
        e.filter(col("vec_id") < NQUERIES), e, "vec_id", "embedding",
        K, DIM, REFINE)
    }),
    "q_ann_pq" -> ((s, dir) => {
      // product quantization: per-subspace L2 codebooks (learned, round-6
      // quantized Lloyd), ADC candidate scan over reconstructions, exact
      // refine — the compressed-domain scale path for flat ANN
      val e = emb(s, dir)
      Similarity.pqTopK(
        e.filter(col("vec_id") < NQUERIES), e, "vec_id", "embedding",
        K, M, KSUB, DIM, PQ_ITERS, REFINE)
    }),
    "q_semantic_screen" -> ((s, dir) => {
      // semantic decontamination: every 20th vector plays the benchmark
      // set; corpus vectors within cosine 0.4 of any bench vector flag
      val e = emb(s, dir)
      Similarity.screenSemantic(
        e.filter(col("vec_id") % 20 =!= 0), e.filter(col("vec_id") % 20 === 0),
        "vec_id", "embedding", SEM_THR)
        .withColumnRenamed("id", "vec_id")
    }),
    "q_ann_ivfadc" -> ((s, dir) => {
      // the composed sub-linear production layout (Jégou PAMI 2011 §IV):
      // learned inverted lists × residual-PQ ADC within probed lists only
      // + exact refine — scan cost is 2/nLists of the corpus in code form
      val e = emb(s, dir)
      Similarity.ivfadcTopK(
        e.filter(col("vec_id") < NQUERIES), e, "vec_id", "embedding",
        K, NLISTS, DIM, KM_ITERS, M, KSUB, PQ_ITERS, REFINE)
    }),
    // margin-based mutual-kNN pair mining (Artetxe & Schwenk 2019): the
    // bitext/cross-dump alignment operator — even ids (bounded side A)
    // paired into the full odd side by ratio margin over mutual top-k
    "q_margin_mine" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.similarity.MarginMine.mineMutual(
        e.filter(col("vec_id") % 2 === 0 && col("vec_id") < 2 * MM_NA),
        e.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", K, MM_THR)
    }),
    // cluster-quality diagnostic: per-cluster simplified silhouette over
    // the SAME deterministic k-means SemDeDup / clusterBalance act on
    "q_silhouette" -> ((s, dir) =>
      graft.similarity.Silhouette.simplifiedSilhouette(
        emb(s, dir), "vec_id", "embedding", NLISTS, DIM, KM_ITERS)),
    // centroid-distance outlier screen: flag embeddings > Z_THR population
    // stddevs from their cluster mean distance — garbage-vector pruning
    // before the ANN index ingests them
    "q_embed_outliers" -> ((s, dir) =>
      graft.similarity.Silhouette.outlierScreen(
        emb(s, dir), "vec_id", "embedding", NLISTS, DIM, KM_ITERS, Z_THR)),
    // embedding-distribution drift: per-label L2 distance between the two
    // halves' mean embeddings — the encoder-swap/topic-shift screen an
    // ANN index or SemDeDup threshold needs before it silently degrades
    "q_embed_drift" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.similarity.EmbedDrift.meanShift(
        e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
        "label", "embedding").orderBy("label")
    }),
    // Matryoshka dimension-quality curve: recall@k of prefix-d search vs
    // full-dim truth for d in {8,16,32,64} — the measurement that picks a
    // serving dimension (d=64 anchors at recall 1.0 by construction)
    "q_mrl_curve" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < NQUERIES)
      val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", K)
      MRL_CURVE_DIMS.map { d =>
        val qd = q.withColumn("embedding", slice(col("embedding"), 1, d))
        val ed = e.withColumn("embedding", slice(col("embedding"), 1, d))
        Similarity.recallAtK(
          Similarity.bruteForceTopK(qd, ed, "vec_id", "embedding", K), exact, K)
          .select(lit(d).as("dims"), col("recall"))
      }.reduce(_ unionByName _)
        .groupBy(col("dims"))
        .agg(count(lit(1)).as("n_queries"),
          round(sum(col("recall").cast("decimal(28,6)")).cast("double") /
            count(lit(1)), 6).as("mean_recall"))
        .orderBy(col("dims"))
    }),
    // order-sensitive ANN evaluation: nDCG@k + MRR of the SRP head against
    // exact brute force — completes the recall@k triad every production
    // retrieval deployment tracks
    "q_rank_eval" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < NQUERIES)
      graft.similarity.RankEval.rankEval(
        Similarity.srpTopK(q, e, "vec_id", "embedding", K, PLANES, DIM),
        Similarity.bruteForceTopK(q, e, "vec_id", "embedding", K), K)
    }),
  )

  private val KM_ITERS = 2
  /** Outlier screen: flag beyond this many population stddevs. */
  private val Z_THR = 2.0
  /** Margin mining: |side A| and the ratio-margin keep threshold. */
  private val MM_NA = 20
  private val MM_THR = 1.2
  private val MRL_DIMS = 16
  /** MRL quality-curve prefix dimensions (64 = full, recall-1 anchor). */
  private val MRL_CURVE_DIMS = Seq(8, 16, 32, 64)
  private val M = 4
  private val KSUB = 8
  private val PQ_ITERS = 2
  private val REFINE = 20
  private val DSUB = DIM / M

  private val dv = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
  private val dvPrefix =
    s"list_transform(list_slice(embedding, 1, $MRL_DIMS), x -> CAST(x AS DOUBLE))"
  private def cosSql(a: String, b: String) =
    s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"

  /** SRP plane literal for the oracle — identical doubles to Scala's. */
  private def planeSql(j: Int): String =
    "[" + Similarity.hyperplane(j, DIM).map(d => f"$d%.17g").mkString(", ") + "]"

  /** IVF centroid literals — identical doubles to Scala's. */
  private def centroidValues: String =
    (0 until NLISTS).map { c =>
      "(" + c + ", [" + Similarity.ivfCentroid(c, DIM).map(d => f"$d%.17g").mkString(", ") + "])"
    }.mkString(", ")

  /** One Lloyd iteration per CTE block, replaying Spark's deterministic
    * k-means exactly: assign by (dot desc, c asc), per-dimension mean
    * rounded to 6 dp, empty clusters keep the previous centroid.
    */
  private def kmeansIterCtes(iters: Int): String =
    (0 until iters).map { i =>
      s"""s$i AS (SELECT vec_id, c, list_dot_product(dv, cent) AS s FROM v CROSS JOIN cents$i),
         |a$i AS (SELECT vec_id, dv, c AS list FROM (
         |         SELECT v.vec_id, v.dv, s$i.c,
         |                row_number() OVER (PARTITION BY s$i.vec_id ORDER BY s$i.s DESC, s$i.c ASC) AS rn
         |         FROM v JOIN s$i ON s$i.vec_id = v.vec_id) WHERE rn = 1),
         |p$i AS (SELECT list, dv, unnest(range(0, $DIM)) AS pos FROM a$i),
         |m$i AS (SELECT list, pos, round(avg(dv[pos + 1]), 6) AS m FROM p$i GROUP BY list, pos),
         |n$i AS (SELECT list AS c, list(m ORDER BY pos) AS cent FROM m$i GROUP BY list),
         |cents${i + 1} AS (SELECT p.c, coalesce(n.cent, p.cent) AS cent
         |                  FROM cents$i p LEFT JOIN n$i n ON p.c = n.c),""".stripMargin
    }.mkString("\n")

  /** PQ codebook init literals for subspace `sub` — identical doubles to
    * Scala's (`%.17g` round-trips exactly).
    */
  private def pqCentValues(sub: Int): String =
    (0 until KSUB).map { c =>
      "(" + c + ", [" + Similarity.ivfCentroid(sub * KSUB + c, DSUB)
        .map(d => f"$d%.17g").mkString(", ") + "])"
    }.mkString(", ")

  /** Per-subspace L2 Lloyd replay + final codeword pick, mirroring
    * `Similarity.pqCodebooks`/`pqCodes` iteration-for-iteration: assign by
    * (c·c − 2·x·c) ASC with ties → lowest code, per-dimension mean rounded
    * to 6 dp, empty codes keep the previous word.
    */
  private def pqSubCtes(sub: Int, src: String = "v"): String = {
    val lo = sub * DSUB + 1
    val hi = (sub + 1) * DSUB
    val head =
      s"""pv$sub AS (SELECT vec_id, list_slice(dv, $lo, $hi) AS dv FROM $src),
         |pc${sub}_0(c, cent) AS (VALUES ${pqCentValues(sub)}),""".stripMargin
    val iters = (0 until PQ_ITERS).map { i =>
      s"""ps${sub}_$i AS (SELECT vec_id, c,
         |    list_dot_product(cent, cent) - 2 * list_dot_product(dv, cent) AS s
         |  FROM pv$sub CROSS JOIN pc${sub}_$i),
         |pa${sub}_$i AS (SELECT vec_id, dv, c AS code FROM (
         |    SELECT pv$sub.vec_id, pv$sub.dv, ps${sub}_$i.c,
         |           row_number() OVER (PARTITION BY ps${sub}_$i.vec_id
         |                              ORDER BY ps${sub}_$i.s ASC, ps${sub}_$i.c ASC) AS rn
         |    FROM pv$sub JOIN ps${sub}_$i ON ps${sub}_$i.vec_id = pv$sub.vec_id) WHERE rn = 1),
         |pp${sub}_$i AS (SELECT code, dv, unnest(range(0, $DSUB)) AS pos FROM pa${sub}_$i),
         |pm${sub}_$i AS (SELECT code, pos, round(avg(dv[pos + 1]), 6) AS m FROM pp${sub}_$i GROUP BY code, pos),
         |pn${sub}_$i AS (SELECT code AS c, list(m ORDER BY pos) AS cent FROM pm${sub}_$i GROUP BY code),
         |pc${sub}_${i + 1} AS (SELECT p.c, coalesce(n.cent, p.cent) AS cent
         |                      FROM pc${sub}_$i p LEFT JOIN pn${sub}_$i n ON p.c = n.c),""".stripMargin
    }.mkString("\n")
    val fin =
      s"""pf$sub AS (SELECT vec_id, c,
         |    list_dot_product(cent, cent) - 2 * list_dot_product(dv, cent) AS s
         |  FROM pv$sub CROSS JOIN pc${sub}_$PQ_ITERS),
         |pw$sub AS (SELECT x.vec_id, cc.cent AS cw FROM (
         |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s ASC, c ASC) AS rn
         |    FROM pf$sub) x JOIN pc${sub}_$PQ_ITERS cc ON cc.c = x.c WHERE x.rn = 1),""".stripMargin
    head + "\n" + iters + "\n" + fin
  }

  /** Shared silhouette CTE chain: k-means replay → per-(vec, centroid)
    * squared L2 via x·x − 2·x·c + c·c → max-dot assignment → per-point
    * a (own-centroid distance) and b (nearest-other distance).
    */
  private def silhouetteCtes: String =
    s"""cents0(c, cent) AS (VALUES $centroidValues),
       |v AS (SELECT vec_id, $dv AS dv FROM embeddings),
       |${kmeansIterCtes(KM_ITERS)}
       |sd AS (SELECT vec_id, c, list_dot_product(dv, cent) AS s,
       |         list_dot_product(dv, dv) - 2.0 * list_dot_product(dv, cent)
       |           + list_dot_product(cent, cent) AS d2
       |       FROM v CROSS JOIN cents$KM_ITERS),
       |assign AS (SELECT vec_id, (array_agg(c ORDER BY s DESC, c ASC))[1] AS cluster
       |           FROM sd GROUP BY vec_id),
       |ab AS (SELECT sd.vec_id, a.cluster,
       |         sqrt(greatest(max(CASE WHEN sd.c = a.cluster THEN sd.d2 END), 0.0)) AS aa,
       |         sqrt(greatest(min(CASE WHEN sd.c <> a.cluster THEN sd.d2 END), 0.0)) AS bb
       |       FROM sd JOIN assign a ON a.vec_id = sd.vec_id
       |       GROUP BY sd.vec_id, a.cluster)""".stripMargin

  /** Per-dimension MRL-curve CTE block (suffix d): prefix-d brute-force
    * ranks → per-query recall vs the shared full-dim `br` chain.
    */
  private def mrlCurveCtes(d: Int): String = {
    val dvP = s"list_transform(list_slice(embedding, 1, $d), x -> CAST(x AS DOUBLE))"
    s"""cq$d AS (SELECT vec_id AS query_id, $dvP AS qv FROM embeddings WHERE vec_id < $NQUERIES),
       |cc$d AS (SELECT vec_id AS neighbor_id, $dvP AS cv FROM embeddings),
       |cs$d AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
       |         FROM cc$d CROSS JOIN cq$d WHERE query_id <> neighbor_id),
       |cr$d AS (SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
       |         FROM cs$d),
       |chit$d AS (SELECT ex.query_id, count(*) AS n_true,
       |             sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
       |           FROM (SELECT query_id, neighbor_id FROM br WHERE rnk <= $K) ex
       |           LEFT JOIN (SELECT query_id, neighbor_id FROM cr$d WHERE rnk <= $K) ap
       |             USING (query_id, neighbor_id)
       |           GROUP BY 1),
       |crec$d AS (SELECT $d AS dims, round(CAST(n_hit AS DOUBLE) / n_true, 6) AS recall
       |           FROM chit$d)""".stripMargin
  }

  /** nDCG gain CASE over 1-based ranks 1..K, literal driver doubles. */
  private def gainCaseSql(rank: String): String =
    (1 to K).map(i => s"WHEN $i THEN ${graft.similarity.RankEval.gain(i)}")
      .mkString(s"CASE $rank ", " ", " ELSE 0.0 END")

  private def bucketSql(v: String): String =
    (0 until PLANES).map { j =>
      s"(CASE WHEN list_dot_product($v, ${planeSql(j)}) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** Shared covariance CTEs: per-coordinate explode (the oracle CAN afford
    * the d² blow-up the engine's Aggregator avoids), then the engine's
    * exact covariance operation order g/n − (s_i/n)·(s_j/n), 6-dp-rounded.
    */
  private def pcaCovCtes: String =
    s"""dims AS (SELECT CAST(x AS INT) AS i FROM range(0, $DIM) r(x)),
       |px AS MATERIALIZED (SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS v
       |       FROM embeddings CROSS JOIN dims),
       |pn AS (SELECT count(*) AS n FROM embeddings),
       |pg AS (SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS s
       |       FROM px a JOIN px b USING (vec_id) GROUP BY 1, 2),
       |pmu AS (SELECT i, sum(v) AS s1 FROM px GROUP BY i),
       |cd0 AS MATERIALIZED (SELECT pg.i, pg.j,
       |          round(pg.s / pn.n - (ma.s1 / pn.n) * (mb.s1 / pn.n), 6) AS cov
       |        FROM pg CROSS JOIN pn
       |        JOIN pmu ma ON ma.i = pg.i JOIN pmu mb ON mb.i = pg.j)""".stripMargin

  /** Power iteration + Hotelling deflation for component `comp` over cd\$comp,
    * replaying `Pca.powerComponents` step-for-step: init e_comp, `iters`
    * rounds of v ← round6(Cv/‖Cv‖), λ = round6(vᵀCv), deflate into
    * cd{comp+1}. Every quantity both engines see is 6-dp-quantized, so
    * summation-order drift (~1e-16) sits nine orders below the quantum.
    */
  private def pcaIterCtes(comp: Int, iters: Int): String = {
    val v0 =
      s"v${comp}_0 AS (SELECT i, CASE WHEN i = $comp THEN 1.0 ELSE 0.0 END AS w FROM dims),"
    val its = (0 until iters).map { t =>
      // each step MATERIALIZED: the chain otherwise re-inlines its whole
      // ancestry per reference — exponential plan blow-up in DuckDB
      s"""u${comp}_${t + 1} AS MATERIALIZED (SELECT c.i AS i, sum(c.cov * v.w) AS u
         |  FROM cd$comp c JOIN v${comp}_$t v ON v.i = c.j GROUP BY c.i),
         |v${comp}_${t + 1} AS MATERIALIZED (SELECT i,
         |    round(u / (SELECT sqrt(sum(u * u)) FROM u${comp}_${t + 1}), 6) AS w
         |  FROM u${comp}_${t + 1}),""".stripMargin
    }.mkString("\n")
    val vN = s"v${comp}_$iters"
    s"""$v0
       |$its
       |lam$comp AS (SELECT round(sum(va.w * c.cov * vb.w), 6) AS l
       |  FROM cd$comp c JOIN $vN va ON va.i = c.i JOIN $vN vb ON vb.i = c.j),
       |cd${comp + 1} AS MATERIALIZED (SELECT c.i, c.j,
       |    round(c.cov - (SELECT l FROM lam$comp) * va.w * vb.w, 6) AS cov
       |  FROM cd$comp c JOIN $vN va ON va.i = c.i JOIN $vN vb ON vb.i = c.j),""".stripMargin
  }

  // learned-k-means IVF oracle, shared by the in-process and the
  // persistent-index formulations (identical semantics)
  private lazy val annIvfOracle: String =
    s"""WITH cents0(c, cent) AS (VALUES $centroidValues),
         |v AS (SELECT vec_id, $dv AS dv FROM embeddings),
         |${kmeansIterCtes(KM_ITERS)}
         |scored AS (SELECT vec_id, c, list_dot_product(dv, cent) AS s FROM v CROSS JOIN cents$KM_ITERS),
         |assign AS (SELECT vec_id,
         |                  (array_agg(c ORDER BY s DESC, c ASC))[1] AS c1,
         |                  (array_agg(c ORDER BY s DESC, c ASC))[2] AS c2
         |           FROM scored GROUP BY vec_id),
         |corpus AS (SELECT v.vec_id AS neighbor_id, v.dv AS cv, a.c1 AS list
         |           FROM v JOIN assign a ON a.vec_id = v.vec_id),
         |probes AS (SELECT v.vec_id AS query_id, v.dv AS qv, a.c1 AS list
         |           FROM v JOIN assign a ON a.vec_id = v.vec_id WHERE v.vec_id < $NQUERIES
         |           UNION ALL
         |           SELECT v.vec_id, v.dv, a.c2
         |           FROM v JOIN assign a ON a.vec_id = v.vec_id WHERE v.vec_id < $NQUERIES),
         |s AS (SELECT DISTINCT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
         |      FROM corpus JOIN probes USING (list) WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id, sim,
         |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= $K
         |""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_cluster_balance" ->
      // same Lloyd replay as the IVF/semdedup family; rate arithmetic is
      // fixed-order IEEE division of exact integers, acceptance replays
      // hash60 verbatim
      s"""WITH cents0(c, cent) AS (VALUES $centroidValues),
         |v AS (SELECT vec_id, $dv AS dv FROM embeddings),
         |${kmeansIterCtes(KM_ITERS)}
         |scored AS (SELECT vec_id, c, list_dot_product(dv, cent) AS s FROM v CROSS JOIN cents$KM_ITERS),
         |asg AS (SELECT vec_id, c AS cluster FROM (
         |          SELECT vec_id, c, row_number() OVER
         |            (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
         |          FROM scored) WHERE rn = 1),
         |cnt AS (SELECT cluster, count(*) AS n_docs FROM asg GROUP BY 1),
         |tot AS (SELECT count(*) AS total FROM asg),
         |rt AS (SELECT cluster, n_docs,
         |         least(CAST(1 AS DOUBLE), CAST(total AS DOUBLE) / $NLISTS / n_docs) AS rate_raw
         |       FROM cnt CROSS JOIN tot),
         |kp AS (SELECT a.cluster, count(*) AS n_kept
         |       FROM asg a JOIN rt USING (cluster)
         |       WHERE CAST(CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % 1000000
         |             < CAST(floor(rate_raw * 1000000) AS BIGINT)
         |       GROUP BY 1)
         |SELECT rt.cluster AS cluster, CAST(rt.n_docs AS BIGINT) AS n_docs,
         |       round(rate_raw, 6) AS rate, CAST(coalesce(kp.n_kept, 0) AS BIGINT) AS n_kept
         |FROM rt LEFT JOIN kp USING (cluster)
         |""".stripMargin,
    "q_pca_covariance" ->
      s"""WITH $pcaCovCtes
         |SELECT i, j, cov FROM cd0
         |""".stripMargin,
    "q_pca_project" ->
      s"""WITH $pcaCovCtes,
         |${(0 until PCA_COMPS).map(c => pcaIterCtes(c, PCA_ITERS)).mkString("\n")}
         |pr0 AS (SELECT px.vec_id, round(sum(px.v * w.w), 6) AS p0
         |        FROM px JOIN v0_$PCA_ITERS w ON w.i = px.i GROUP BY px.vec_id),
         |pr1 AS (SELECT px.vec_id, round(sum(px.v * w.w), 6) AS p1
         |        FROM px JOIN v1_$PCA_ITERS w ON w.i = px.i GROUP BY px.vec_id)
         |SELECT pr0.vec_id, pr0.p0, pr1.p1 FROM pr0 JOIN pr1 USING (vec_id)
         |""".stripMargin,
    "q_pca_whiten" ->
      // projection CTEs + division by the chain's own quantized sqrt(λ)
      s"""WITH $pcaCovCtes,
         |${(0 until PCA_COMPS).map(c => pcaIterCtes(c, PCA_ITERS)).mkString("\n")}
         |pr0 AS (SELECT px.vec_id, round(sum(px.v * w.w), 6) AS p0
         |        FROM px JOIN v0_$PCA_ITERS w ON w.i = px.i GROUP BY px.vec_id),
         |pr1 AS (SELECT px.vec_id, round(sum(px.v * w.w), 6) AS p1
         |        FROM px JOIN v1_$PCA_ITERS w ON w.i = px.i GROUP BY px.vec_id)
         |SELECT pr0.vec_id,
         |       round(pr0.p0 / (SELECT sqrt(l) FROM lam0), 6) AS w0,
         |       round(pr1.p1 / (SELECT sqrt(l) FROM lam1), 6) AS w1
         |FROM pr0 JOIN pr1 USING (vec_id)
         |""".stripMargin,
    "q_ann_pca" ->
      // same projection CTEs; candidate rank by 6-dp-rounded NEGATED
      // projected L2 (ties → lowest neighbor), exact cosine on the
      // shortlist, both ranks replaying the engine's (score desc, id) order
      s"""WITH $pcaCovCtes,
         |${(0 until PCA_COMPS).map(c => pcaIterCtes(c, PCA_ITERS)).mkString("\n")}
         |pr0 AS (SELECT px.vec_id, round(sum(px.v * w.w), 6) AS p0
         |        FROM px JOIN v0_$PCA_ITERS w ON w.i = px.i GROUP BY px.vec_id),
         |pr1 AS (SELECT px.vec_id, round(sum(px.v * w.w), 6) AS p1
         |        FROM px JOIN v1_$PCA_ITERS w ON w.i = px.i GROUP BY px.vec_id),
         |pj AS MATERIALIZED (SELECT pr0.vec_id, pr0.p0, pr1.p1
         |                    FROM pr0 JOIN pr1 USING (vec_id)),
         |qj AS (SELECT * FROM pj WHERE vec_id < $NQUERIES),
         |cand AS (SELECT qj.vec_id AS query_id, c.vec_id AS neighbor_id,
         |           round(-((qj.p0 - c.p0) * (qj.p0 - c.p0)
         |                   + (qj.p1 - c.p1) * (qj.p1 - c.p1)), 6) AS nd
         |         FROM pj c CROSS JOIN qj WHERE qj.vec_id != c.vec_id),
         |sh AS (SELECT query_id, neighbor_id FROM (
         |         SELECT query_id, neighbor_id,
         |                row_number() OVER (PARTITION BY query_id
         |                  ORDER BY nd DESC, neighbor_id) AS rr
         |         FROM cand) WHERE rr <= $REFINE),
         |dvs AS (SELECT vec_id, $dv AS v FROM embeddings),
         |rs AS (SELECT sh.query_id, sh.neighbor_id,
         |         ${cosSql("qd.v", "cd.v")} AS sim
         |       FROM sh JOIN dvs cd ON cd.vec_id = sh.neighbor_id
         |       JOIN dvs qd ON qd.vec_id = sh.query_id)
         |SELECT query_id, neighbor_id, sim,
         |       CAST(row_number() OVER (PARTITION BY query_id
         |         ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
         |FROM rs QUALIFY rnk <= $K
         |""".stripMargin,
    "q_hybrid_rrf" ->
      // lexical chain shared verbatim with q_bm25_topk (terminal CTE r);
      // dense chain is the knn oracle re-predicated to residue-5 queries;
      // the RRF terms are 1/(60+rank) of exact INTEGER ranks — the doubles
      // are bit-identical in both engines, and the two-term sum is written
      // in fixed order, so no rounding hazard exists before the 6-dp pin
      s"""WITH ${TextQueries.bm25Ctes},
         |dq AS (SELECT vec_id AS query_id, $dv AS qv FROM embeddings WHERE vec_id % 20 = 5),
         |dc AS (SELECT vec_id AS neighbor_id, $dv AS cv FROM embeddings),
         |ds AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
         |       FROM dc CROSS JOIN dq WHERE query_id <> neighbor_id),
         |dr AS (SELECT query_id, neighbor_id AS doc_id,
         |              CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
         |       FROM ds),
         |u AS (SELECT query_id, doc_id, rnk, 'lex' AS src FROM r WHERE rnk <= 10
         |      UNION ALL
         |      SELECT query_id, doc_id, rnk, 'dense' AS src FROM dr WHERE rnk <= 10),
         |pv AS (SELECT query_id, doc_id,
         |         max(CASE WHEN src = 'lex' THEN rnk END) AS rnk_lex,
         |         max(CASE WHEN src = 'dense' THEN rnk END) AS rnk_dense
         |       FROM u GROUP BY 1, 2),
         |f AS (SELECT query_id, doc_id, rnk_lex, rnk_dense,
         |        round(coalesce(CAST(1 AS DOUBLE) / (60 + rnk_lex), CAST(0 AS DOUBLE))
         |            + coalesce(CAST(1 AS DOUBLE) / (60 + rnk_dense), CAST(0 AS DOUBLE)), 6) AS rrf
         |      FROM pv)
         |SELECT query_id, doc_id, rnk_lex, rnk_dense, rrf,
         |       CAST(row_number() OVER (PARTITION BY query_id
         |         ORDER BY rrf DESC, doc_id) AS INT) AS rnk
         |FROM f QUALIFY rnk <= 10
         |""".stripMargin,
    "q_ann_mrl" ->
      // stage 1 ranks by the 6-dp-pinned prefix cosine with neighbor_id
      // tie-break (deterministic shortlist boundary), stage 2 re-ranks the
      // shortlist by exact full-dim cosine — both replayed verbatim
      s"""WITH mq AS (SELECT vec_id AS query_id, $dvPrefix AS qp, $dv AS qv
         |            FROM embeddings WHERE vec_id < $NQUERIES),
         |mc AS (SELECT vec_id AS neighbor_id, $dvPrefix AS cp, $dv AS cv FROM embeddings),
         |m1 AS (SELECT query_id, neighbor_id, ${cosSql("qp", "cp")} AS psim
         |       FROM mc CROSS JOIN mq WHERE query_id <> neighbor_id),
         |msh AS (SELECT query_id, neighbor_id FROM
         |          (SELECT query_id, neighbor_id, row_number() OVER
         |             (PARTITION BY query_id ORDER BY psim DESC, neighbor_id) AS prnk
         |           FROM m1)
         |        WHERE prnk <= $REFINE),
         |m2 AS (SELECT msh.query_id, msh.neighbor_id, ${cosSql("mqd.qv", "mcd.cv")} AS sim
         |       FROM msh JOIN mc mcd ON mcd.neighbor_id = msh.neighbor_id
         |                JOIN mq mqd ON mqd.query_id = msh.query_id)
         |SELECT query_id, neighbor_id, sim,
         |       CAST(row_number() OVER (PARTITION BY query_id
         |         ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
         |FROM m2 QUALIFY rnk <= $K
         |""".stripMargin,
    "q_ann_recall" ->
      // exact chain = the q_knn_bruteforce oracle, approx chain = the
      // q_ann_srp oracle; recall joins the two k-lists per query
      s"""WITH bq AS (SELECT vec_id AS query_id, $dv AS qv FROM embeddings WHERE vec_id < $NQUERIES),
         |bc AS (SELECT vec_id AS neighbor_id, $dv AS cv FROM embeddings),
         |bs AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
         |       FROM bc CROSS JOIN bq WHERE query_id <> neighbor_id),
         |br AS (SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
         |       FROM bs),
         |aq AS (SELECT vec_id AS query_id, qv, ${bucketSql("qv")} AS bucket
         |       FROM (SELECT vec_id, $dv AS qv FROM embeddings WHERE vec_id < $NQUERIES)),
         |ac AS (SELECT vec_id AS neighbor_id, cv, ${bucketSql("cv")} AS bucket
         |       FROM (SELECT vec_id, $dv AS cv FROM embeddings)),
         |asv AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
         |        FROM ac JOIN aq ON ac.bucket = aq.bucket WHERE query_id <> neighbor_id),
         |ar AS (SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
         |       FROM asv),
         |ex AS (SELECT query_id, neighbor_id FROM br WHERE rnk <= $K),
         |ap AS (SELECT query_id, neighbor_id, CAST(1 AS BIGINT) AS hit FROM ar WHERE rnk <= $K),
         |g AS (SELECT ex.query_id, count(*) AS n_true, sum(coalesce(ap.hit, 0)) AS n_hit
         |      FROM ex LEFT JOIN ap USING (query_id, neighbor_id) GROUP BY 1)
         |SELECT query_id, CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
         |       round(CAST(n_hit AS DOUBLE) / n_true, 6) AS recall
         |FROM g
         |""".stripMargin,
    "q_embed_drift" ->
      // per-(label, dimension) 6-dp-pinned means on both halves, exact
      // DECIMAL(18,6) diffs squared and summed, one IEEE sqrt
      s"""WITH av AS (SELECT label AS grp, $dv AS dvv FROM embeddings WHERE vec_id % 2 = 0),
         |bv AS (SELECT label AS grp, $dv AS dvv FROM embeddings WHERE vec_id % 2 = 1),
         |pa AS (SELECT grp, dvv, unnest(range(0, $DIM)) AS pos FROM av),
         |pb AS (SELECT grp, dvv, unnest(range(0, $DIM)) AS pos FROM bv),
         |ma AS (SELECT grp, pos, count(*) AS na,
         |         CAST(round(avg(dvv[pos + 1]), 6) AS DECIMAL(18,6)) AS m_a
         |       FROM pa GROUP BY 1, 2),
         |mb AS (SELECT grp, pos, count(*) AS nb,
         |         CAST(round(avg(dvv[pos + 1]), 6) AS DECIMAL(18,6)) AS m_b
         |       FROM pb GROUP BY 1, 2),
         |j AS (SELECT ma.grp, ma.na, mb.nb, (ma.m_a - mb.m_b) * (ma.m_a - mb.m_b) AS d2
         |      FROM ma JOIN mb ON ma.grp = mb.grp AND ma.pos = mb.pos)
         |SELECT grp AS label, CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b,
         |       round(sqrt(CAST(sum(d2) AS DOUBLE)), 6) AS shift
         |FROM j GROUP BY grp ORDER BY grp
         |""".stripMargin,
    "q_mrl_curve" ->
      // shared full-dim br chain + one prefix-d rank chain per dimension;
      // per-query recalls are exact multiples of 1/K, summed as decimals
      s"""WITH bq AS (SELECT vec_id AS query_id, $dv AS qv FROM embeddings WHERE vec_id < $NQUERIES),
         |bc AS (SELECT vec_id AS neighbor_id, $dv AS cv FROM embeddings),
         |bs AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
         |       FROM bc CROSS JOIN bq WHERE query_id <> neighbor_id),
         |br AS (SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
         |       FROM bs),
         |${MRL_CURVE_DIMS.map(mrlCurveCtes).mkString(",\n")},
         |u AS (${MRL_CURVE_DIMS.map(d => s"SELECT * FROM crec$d").mkString(" UNION ALL ")})
         |SELECT CAST(dims AS INT) AS dims, count(*) AS n_queries,
         |       round(CAST(sum(CAST(recall AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS mean_recall
         |FROM u GROUP BY dims ORDER BY dims
         |""".stripMargin,
    "q_rank_eval" ->
      // same exact/approx rank chains as q_ann_recall; the per-position
      // gain table 1/log2(i+1) is interpolated as driver-computed literal
      // doubles so neither engine's log2 enters the comparison
      s"""WITH bq AS (SELECT vec_id AS query_id, $dv AS qv FROM embeddings WHERE vec_id < $NQUERIES),
         |bc AS (SELECT vec_id AS neighbor_id, $dv AS cv FROM embeddings),
         |bs AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
         |       FROM bc CROSS JOIN bq WHERE query_id <> neighbor_id),
         |br AS (SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
         |       FROM bs),
         |aq AS (SELECT vec_id AS query_id, qv, ${bucketSql("qv")} AS bucket
         |       FROM (SELECT vec_id, $dv AS qv FROM embeddings WHERE vec_id < $NQUERIES)),
         |ac AS (SELECT vec_id AS neighbor_id, cv, ${bucketSql("cv")} AS bucket
         |       FROM (SELECT vec_id, $dv AS cv FROM embeddings)),
         |asv AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
         |        FROM ac JOIN aq ON ac.bucket = aq.bucket WHERE query_id <> neighbor_id),
         |ar AS (SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
         |       FROM asv),
         |ex AS (SELECT query_id, neighbor_id, rnk AS e_rnk FROM br WHERE rnk <= $K),
         |ap AS (SELECT query_id, neighbor_id, rnk AS a_rnk FROM ar WHERE rnk <= $K),
         |j AS (SELECT ex.query_id, ex.e_rnk, ap.a_rnk
         |      FROM ex LEFT JOIN ap USING (query_id, neighbor_id)),
         |g AS (SELECT query_id, count(*) AS n_true,
         |        sum(CASE WHEN a_rnk IS NOT NULL THEN ${gainCaseSql("a_rnk")} ELSE 0.0 END) AS dcg,
         |        sum(${gainCaseSql("e_rnk")}) AS idcg,
         |        max(CASE WHEN e_rnk = 1 AND a_rnk IS NOT NULL
         |                 THEN 1.0 / CAST(a_rnk AS DOUBLE) ELSE 0.0 END) AS rr
         |      FROM j GROUP BY 1)
         |SELECT query_id, CAST(n_true AS BIGINT) AS n_true,
         |       round(dcg / idcg, 6) AS ndcg, round(rr, 6) AS mrr
         |FROM g
         |""".stripMargin,
    "q_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, label AS ql, $dv AS qv FROM embeddings WHERE vec_id < $NQUERIES),
         |c AS (SELECT vec_id AS neighbor_id, label AS cl, $dv AS cv FROM embeddings),
         |s AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
         |      FROM c CROSS JOIN q WHERE query_id <> neighbor_id AND ql <> cl),
         |r AS (SELECT query_id, neighbor_id, sim,
         |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= $K
         |""".stripMargin,
    "q_knn_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, $dv AS qv FROM embeddings WHERE vec_id < $NQUERIES),
         |c AS (SELECT vec_id AS neighbor_id, $dv AS cv FROM embeddings),
         |s AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
         |      FROM c CROSS JOIN q WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id, sim,
         |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= $K
         |""".stripMargin,
    "q_semantic_screen" ->
      // argmax ties replay the engine's max(struct(sim, bench_id)):
      // highest sim, then highest bench_id
      s"""WITH b AS (SELECT vec_id AS bench_id, $dv AS bv FROM embeddings WHERE vec_id % 20 = 0),
         |c AS (SELECT vec_id, $dv AS cv FROM embeddings WHERE vec_id % 20 != 0),
         |s AS (SELECT vec_id, bench_id, ${cosSql("cv", "bv")} AS sim FROM c CROSS JOIN b),
         |r AS (SELECT vec_id, bench_id, sim, row_number() OVER
         |        (PARTITION BY vec_id ORDER BY sim DESC, bench_id DESC) AS rn
         |      FROM s)
         |SELECT vec_id, bench_id, sim AS max_sim, sim >= $SEM_THR AS flagged
         |FROM r WHERE rn = 1
         |""".stripMargin,
    "q_ann_srp" ->
      s"""WITH q AS (SELECT vec_id AS query_id, qv, ${bucketSql("qv")} AS bucket
         |           FROM (SELECT vec_id, $dv AS qv FROM embeddings WHERE vec_id < $NQUERIES)),
         |c AS (SELECT vec_id AS neighbor_id, cv, ${bucketSql("cv")} AS bucket
         |      FROM (SELECT vec_id, $dv AS cv FROM embeddings)),
         |s AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim
         |      FROM c JOIN q ON c.bucket = q.bucket WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id, sim,
         |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= $K
         |""".stripMargin,
    "q_ann_ivf" -> annIvfOracle,
    // identical semantics and oracle — only the PHYSICAL layout differs
    // (on-disk bucketed inverted lists + co-located zero-shuffle probe)
    "q_ann_persistent" -> annIvfOracle,

    "q_semdedup" ->
      s"""WITH cents0(c, cent) AS (VALUES $centroidValues),
         |v AS (SELECT vec_id, $dv AS dv FROM embeddings),
         |${kmeansIterCtes(KM_ITERS)}
         |scored AS (SELECT vec_id, c, list_dot_product(dv, cent) AS s FROM v CROSS JOIN cents$KM_ITERS),
         |assign AS (SELECT vec_id, (array_agg(c ORDER BY s DESC, c ASC))[1] AS cluster
         |           FROM scored GROUP BY vec_id),
         |w0 AS (SELECT v.vec_id, v.dv, a.cluster FROM v JOIN assign a ON a.vec_id = v.vec_id),
         |cs AS (SELECT cluster, CAST(ceil(CAST(count(*) AS DOUBLE) / $SEM_CAP) AS INT) AS nsub
         |       FROM w0 GROUP BY cluster),
         |w AS (SELECT w0.*,
         |             CAST(CAST(('0x' || substr(md5(CAST(w0.vec_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)
         |               % cs.nsub AS sub
         |      FROM w0 JOIN cs ON cs.cluster = w0.cluster),
         |d AS (SELECT b.vec_id, min(a.vec_id) AS dup_of
         |      FROM w a JOIN w b ON a.cluster = b.cluster AND a.sub = b.sub AND a.vec_id < b.vec_id
         |      WHERE ${cosSql("a.dv", "b.dv")} >= $NEARDUP_THR
         |      GROUP BY b.vec_id)
         |SELECT w.vec_id, CAST(w.cluster AS INT) AS cluster,
         |       coalesce(d.dup_of, CAST(-1 AS BIGINT)) AS dup_of,
         |       CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS keep
         |FROM w LEFT JOIN d ON w.vec_id = d.vec_id
         |""".stripMargin,
    "q_silhouette" ->
      s"""WITH $silhouetteCtes,
         |sil AS (SELECT vec_id, cluster,
         |          CASE WHEN greatest(aa, bb) = 0.0 THEN 0.0
         |               ELSE round((bb - aa) / greatest(aa, bb), 6) END AS sil
         |        FROM ab)
         |SELECT CAST(cluster AS INT) AS cluster, CAST(count(*) AS BIGINT) AS n_vecs,
         |       round(avg(sil), 6) AS mean_sil
         |FROM sil GROUP BY cluster
         |""".stripMargin,
    "q_embed_outliers" ->
      // explicit-moments variance (Σd²/n − mean², clamped at 0) written
      // identically to the engine — never each side's own streaming stddev
      s"""WITH $silhouetteCtes,
         |pts AS (SELECT vec_id, cluster, round(aa, 6) AS dist FROM ab),
         |st AS (SELECT cluster, count(*) AS n, sum(dist) AS s, sum(dist * dist) AS s2
         |       FROM pts GROUP BY cluster),
         |stats AS (SELECT cluster, s / n AS mean,
         |            sqrt(greatest(s2 / n - (s / n) * (s / n), 0.0)) AS sd_
         |          FROM st),
         |z AS (SELECT p.vec_id, p.cluster, p.dist,
         |        CASE WHEN stats.sd_ = 0.0 THEN 0.0
         |             ELSE round((p.dist - stats.mean) / stats.sd_, 6) END AS z
         |      FROM pts p JOIN stats ON stats.cluster = p.cluster)
         |SELECT vec_id, CAST(cluster AS INT) AS cluster, dist, z, z > $Z_THR AS flagged
         |FROM z
         |""".stripMargin,
    "q_cosine_neardup" ->
      s"""WITH v AS (SELECT vec_id, dv, ${bucketSql("dv")} AS block
         |           FROM (SELECT vec_id, $dv AS dv FROM embeddings)),
         |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.dv", "b.dv")} AS sim
         |          FROM v a JOIN v b ON a.block = b.block AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, sim FROM pairs WHERE sim >= $NEARDUP_THR
         |""".stripMargin,
    "q_ann_ivfadc" ->
      // coarse k-means replay -> per-vector residual vs its own centroid ->
      // residual-PQ codebook replay (same Lloyd recipe, source = residuals)
      // -> ADC over centroid+decode reconstructions WITHIN probed lists ->
      // exact refine; mirrors Similarity.ivfadcTopK stage for stage
      s"""WITH cents0(c, cent) AS (VALUES $centroidValues),
         |v AS (SELECT vec_id, $dv AS dv FROM embeddings),
         |${kmeansIterCtes(KM_ITERS)}
         |scored AS (SELECT vec_id, c, list_dot_product(dv, cent) AS s FROM v CROSS JOIN cents$KM_ITERS),
         |assign AS (SELECT vec_id,
         |                  (array_agg(c ORDER BY s DESC, c ASC))[1] AS c1,
         |                  (array_agg(c ORDER BY s DESC, c ASC))[2] AS c2
         |           FROM scored GROUP BY vec_id),
         |rvt AS (SELECT v.vec_id,
         |               list_transform(range(1, ${DIM + 1}), i -> v.dv[i] - cc.cent[i]) AS dv
         |        FROM v JOIN assign a ON a.vec_id = v.vec_id
         |        JOIN cents$KM_ITERS cc ON cc.c = a.c1),
         |${(0 until M).map(s => pqSubCtes(s, src = "rvt")).mkString("\n")}
         |recon AS (SELECT v.vec_id,
         |                 list_transform(range(1, ${DIM + 1}),
         |                   i -> cc.cent[i] + (flatten([${(0 until M).map(s => s"pw$s.cw").mkString(", ")}]))[i]) AS rv
         |          FROM v ${(0 until M).map(s => s"JOIN pw$s ON pw$s.vec_id = v.vec_id").mkString(" ")}
         |          JOIN assign a ON a.vec_id = v.vec_id
         |          JOIN cents$KM_ITERS cc ON cc.c = a.c1),
         |corpus AS (SELECT v.vec_id AS neighbor_id, v.dv AS cv, a.c1 AS list, r.rv
         |           FROM v JOIN assign a ON a.vec_id = v.vec_id
         |           JOIN recon r ON r.vec_id = v.vec_id),
         |probes AS (SELECT v.vec_id AS query_id, v.dv AS qv, a.c1 AS list
         |           FROM v JOIN assign a ON a.vec_id = v.vec_id WHERE v.vec_id < $NQUERIES
         |           UNION ALL
         |           SELECT v.vec_id, v.dv, a.c2
         |           FROM v JOIN assign a ON a.vec_id = v.vec_id WHERE v.vec_id < $NQUERIES),
         |adc AS (SELECT query_id, neighbor_id, cv, qv, ${cosSql("qv", "rv")} AS sim_adc
         |        FROM corpus JOIN probes USING (list) WHERE query_id <> neighbor_id),
         |cand AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY sim_adc DESC, neighbor_id) AS rnk_adc
         |    FROM adc) WHERE rnk_adc <= $REFINE),
         |re AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim FROM cand),
         |r AS (SELECT query_id, neighbor_id, sim,
         |             CAST(row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
         |      FROM re)
         |SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= $K
         |""".stripMargin,
    // SQ8: DuckDB retrains the per-dim min/max, re-derives every code and
    // reconstruction, and replays ADC + refine — floor/least/affine maps
    // are the same IEEE expressions both sides
    "q_ann_sq" ->
      s"""WITH v AS (SELECT vec_id, $dv AS dv FROM embeddings),
         |pos AS (SELECT CAST(x AS INT) AS i FROM range(0, $DIM) r(x)),
         |el AS (SELECT v.vec_id, p.i, dv[p.i + 1] AS x FROM v CROSS JOIN pos p),
         |mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM el GROUP BY 1),
         |cd AS (SELECT vec_id, i,
         |    CASE WHEN mx = mn THEN 0
         |         ELSE CAST(least(floor((x - mn) * 255.0 / (mx - mn)), 255.0) AS INT) END AS c,
         |    mn, mx
         |  FROM el JOIN mm USING (i)),
         |rc AS (SELECT vec_id,
         |    list(mn + CAST(c AS DOUBLE) * (mx - mn) / 255.0 ORDER BY i) AS rv
         |  FROM cd GROUP BY 1),
         |q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < $NQUERIES),
         |adc AS (SELECT q.query_id, v.vec_id AS neighbor_id, v.dv AS cv, q.qv,
         |               ${cosSql("q.qv", "r.rv")} AS sim_adc
         |        FROM rc r JOIN v ON v.vec_id = r.vec_id CROSS JOIN q
         |        WHERE q.query_id <> v.vec_id),
         |cand AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY sim_adc DESC, neighbor_id) AS rnk_adc
         |    FROM adc) t1 WHERE rnk_adc <= $REFINE),
         |re AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim FROM cand),
         |r AS (SELECT query_id, neighbor_id, sim,
         |             CAST(row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
         |      FROM re)
         |SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= $K
         |""".stripMargin,
    "q_ann_pq" ->
      s"""WITH v AS (SELECT vec_id, $dv AS dv FROM embeddings),
         |${(0 until M).map(s => pqSubCtes(s)).mkString("\n")}
         |recon AS (SELECT v.vec_id,
         |                 flatten([${(0 until M).map(s => s"pw$s.cw").mkString(", ")}]) AS rv
         |          FROM v ${(0 until M).map(s => s"JOIN pw$s ON pw$s.vec_id = v.vec_id").mkString(" ")}),
         |q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < $NQUERIES),
         |adc AS (SELECT q.query_id, v.vec_id AS neighbor_id, v.dv AS cv, q.qv,
         |               ${cosSql("q.qv", "r.rv")} AS sim_adc
         |        FROM recon r JOIN v ON v.vec_id = r.vec_id CROSS JOIN q
         |        WHERE q.query_id <> v.vec_id),
         |cand AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY sim_adc DESC, neighbor_id) AS rnk_adc
         |    FROM adc) WHERE rnk_adc <= $REFINE),
         |re AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim FROM cand),
         |r AS (SELECT query_id, neighbor_id, sim,
         |             CAST(row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
         |      FROM re)
         |SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= $K
         |""".stripMargin,
    "q_margin_mine" ->
      // forward/backward brute-force lists, exact-decimal list sums, one
      // IEEE division per margin — the engine's chain replayed stage for
      // stage; backward rank ties break to the smaller side-A id exactly
      // like topKPerQuery's (sim DESC, neighbor_id) ordering
      s"""WITH qa AS (SELECT vec_id AS query_id, $dv AS qv FROM embeddings
         |            WHERE vec_id % 2 = 0 AND vec_id < ${2 * MM_NA}),
         |cb AS (SELECT vec_id AS neighbor_id, $dv AS cv FROM embeddings WHERE vec_id % 2 = 1),
         |fs AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS sim FROM cb CROSS JOIN qa),
         |fr AS (SELECT query_id, neighbor_id, sim,
         |              row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
         |       FROM fs),
         |fwd AS (SELECT query_id, neighbor_id, sim FROM fr WHERE rn <= $K),
         |sa AS (SELECT query_id, sum(CAST(sim AS DECIMAL(28,6))) AS suma FROM fwd GROUP BY 1),
         |cand AS (SELECT DISTINCT neighbor_id FROM fwd),
         |bs AS (SELECT cb.neighbor_id AS b_id, qa.query_id AS a_id,
         |              ${cosSql("cb.cv", "qa.qv")} AS sim
         |       FROM cb JOIN cand USING (neighbor_id) CROSS JOIN qa),
         |br AS (SELECT b_id, a_id, sim,
         |              row_number() OVER (PARTITION BY b_id ORDER BY sim DESC, a_id) AS rn
         |       FROM bs),
         |bwd AS (SELECT b_id, a_id, sim FROM br WHERE rn <= $K),
         |sb AS (SELECT b_id, sum(CAST(sim AS DECIMAL(28,6))) AS sumb FROM bwd GROUP BY 1),
         |mu AS (SELECT f.query_id, f.neighbor_id, f.sim,
         |              round(CAST(CAST(f.sim AS DECIMAL(28,6)) * ${2 * K} AS DOUBLE)
         |                    / CAST(sa.suma + sb.sumb AS DOUBLE), 6) AS margin
         |       FROM fwd f
         |       JOIN bwd ON bwd.b_id = f.neighbor_id AND bwd.a_id = f.query_id
         |       JOIN sa ON sa.query_id = f.query_id
         |       JOIN sb ON sb.b_id = f.neighbor_id),
         |mr AS (SELECT query_id, neighbor_id, sim, margin,
         |              row_number() OVER (PARTITION BY query_id ORDER BY margin DESC, neighbor_id) AS rn
         |       FROM mu WHERE margin >= $MM_THR)
         |SELECT query_id, neighbor_id, sim, margin FROM mr WHERE rn = 1
         |""".stripMargin,
  )
}
