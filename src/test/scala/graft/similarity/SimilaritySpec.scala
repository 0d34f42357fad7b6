package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private val DIM = 8

  // deterministic corpus: vec 1 = vec 0 scaled (cosine 1), vec 2 = -vec 0,
  // rest pseudo-random via sin
  private def corpus = {
    val base = (0 until DIM).map(d => math.sin(d + 1).toFloat)
    val rows = Seq(
      (0L, base),
      (1L, base.map(x => x * 2f)),
      (2L, base.map(x => -x))) ++
      (3L to 20L).map(i => (i, (0 until DIM).map(d => math.sin(i * 31 + d).toFloat)))
    rows.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")
  }

  test("bruteForceTopK: scaled copy ranks first with cosine 1, negation last") {
    val top = Similarity.bruteForceTopK(
      corpus.filter(col("vec_id") === 0L), corpus, "vec_id", "embedding", 20)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim"), r.getAs[Int]("rnk")))
    assert(top.find(_._3 == 1).get._1 == 1L)
    assert(top.find(_._3 == 1).get._2 == 1.0)
    assert(top.maxBy(_._3)._1 == 2L) // cosine -1 ranks last
    assert(top.maxBy(_._3)._2 == -1.0)
  }

  test("srpTopK: results are a subset of brute-force candidates; scaled copy shares every bucket") {
    val q = corpus.filter(col("vec_id") === 0L)
    val srp = Similarity.srpTopK(q, corpus, "vec_id", "embedding", 5, nPlanes = 4, dim = DIM)
      .select("neighbor_id").as[Long].collect().toSet
    // scaled copy has identical signs on every hyperplane -> same bucket
    assert(srp.contains(1L))
    val brute = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", 20)
      .select("neighbor_id").as[Long].collect().toSet
    assert(srp.subsetOf(brute))
  }

  test("learned IVF centroids improve recall@10 over trig stand-ins at equal nprobe") {
    // 8 orthogonal direction clusters x 10 vectors with small jitter over 8
    // lists: k-means should land one centroid per cluster; the trig
    // stand-ins have no relation to the data, so several clusters share a
    // list and nprobe=2 misses neighbors
    val dim = 8
    val rows = for {
      cl <- 0 until 8
      i <- 0 until 10
    } yield {
      val base = (0 until dim).map(d => if (d == cl) 10.0 else 0.0)
      val jit = (0 until dim).map(d => math.sin(cl * 131 + i * 17 + d) * 2.5)
      ((cl * 10 + i).toLong, base.zip(jit).map { case (b, j) => (b + j).toFloat }.toArray)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 10 === 0)
    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 9)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    val trig = recall(Similarity.ivfTopK(queries, corpus, "vec_id", "embedding", 9, 8, dim))
    val learned = recall(Similarity.ivfTopKLearned(queries, corpus, "vec_id", "embedding", 9, 8, dim, iters = 5))
    assert(learned > trig, s"learned recall $learned should beat trig recall $trig")
    assert(learned >= 0.75, s"learned recall $learned too low on separable clusters")
  }

  test("kmeans centroids are deterministic and quantized to 6 dp") {
    val dim = 8
    val corpus = (0L to 20L).map(i =>
      (i, (0 until dim).map(d => math.sin(i * 31 + d).toFloat).toArray)).toDF("vec_id", "embedding")
    val a = Similarity.kmeansCentroids(corpus, "embedding", 4, dim, 2)
    val b = Similarity.kmeansCentroids(corpus, "embedding", 4, dim, 2)
    assert(a == b)
    a.flatten.foreach { x =>
      assert(math.abs(x * 1e6 - math.rint(x * 1e6)) < 1e-6, s"$x not 6-dp quantized")
    }
  }

  test("cosineNearDupPairs finds the planted near-identical pair within a block") {
    val blocked = corpus.withColumn("block", lit(1))
    val pairs = Similarity.cosineNearDupPairs(blocked, "vec_id", "embedding", "block", 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("topKPerQuery equals the naive per-query window rank") {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(spark)
    val q = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), Similarity.asDouble(col("embedding")).as("qv"))
    val c = corpus
      .select(col("vec_id").as("neighbor_id"), Similarity.asDouble(col("embedding")).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(Similarity.cosineFast(col("qv"), col("cv")), 6))
    val naive = scored.withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= 5)
      .select("query_id", "neighbor_id", "sim", "rnk")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val staged = Similarity.topKPerQuery(scored, "sim", 5)
      .select("query_id", "neighbor_id", "sim", "rnk")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(staged === naive)
  }

  test("pq codes are m small ints and the reconstruction approximates the vector") {
    val m = 4
    val ksub = 4
    val cb = Similarity.pqCodebooks(corpus, "embedding", m, ksub, DIM, 2)
    assert(cb.size == m && cb.forall(sub => sub.size == ksub && sub.forall(_.size == DIM / m)))
    val enc = corpus.select(col("vec_id"),
        Similarity.pqCodes(Similarity.asDouble(col("embedding")), cb, DIM).as("code"))
      .as[(Long, Seq[Int])].collect()
    assert(enc.forall(_._2.size == m))
    assert(enc.forall(_._2.forall(c => c >= 0 && c < ksub)))
  }

  test("pqTopK with refine = corpus size reproduces brute force exactly") {
    // the ADC stage only CUTS candidates; with refine >= |corpus| the exact
    // re-rank sees everything, so the output must equal bruteForceTopK
    val q = corpus.filter(col("vec_id") < 3)
    val bf = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val pq = Similarity.pqTopK(q, corpus, "vec_id", "embedding", 5,
        m = 4, ksub = 4, dim = DIM, iters = 2, refine = 100)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(pq === bf)
  }

  test("pqTopK recall@5 with tight refine stays useful and runs are deterministic") {
    val q = corpus.filter(col("vec_id") < 3)
    def run() = Similarity.pqTopK(q, corpus, "vec_id", "embedding", 5,
        m = 4, ksub = 4, dim = DIM, iters = 2, refine = 8)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val a = run(); val b = run()
    assert(a === b)
    val bf = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect()
    val bfSet = bf.map(r => (r._1, r._2)).toSet
    val hits = a.count(r => bfSet.contains((r._1, r._2)))
    assert(hits >= a.length / 2, s"recall too low: $hits of ${a.length}")
  }

  test("semDedup drops exact/scaled copies, keeps antipodes, and the kept set has no near-dup pair") {
    // vec 1 is vec 0 scaled (cosine exactly 1 → dup of 0); vec 2 = −vec 0
    // (cosine −1 → NOT a dup at any positive threshold)
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
        threshold = 0.95, nLists = 2, dim = DIM, iters = 1)
      .as[(Long, Int, Long, Int)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 === 0L && byId(1L)._4 === 0, "scaled copy must be dropped as dup of 0")
    assert(byId(2L)._4 === 1, "antipode is not a near-dup")
    // invariant: among kept vectors no within-cluster pair reaches the threshold
    val kept = out.filter(_._4 == 1)
    val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (ab, aa, bb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
        case ((s, x2, y2), (x, y)) => (s + x * y, x2 + x * x, y2 + y * y)
      }
      ab / math.sqrt(aa * bb)
    }
    for {
      x <- kept; y <- kept if x._1 < y._1 && x._2 == y._2
    } assert(cos(vecs(x._1), vecs(y._1)) < 0.95,
      s"kept pair ${x._1},${y._1} is a near-dup")
    // dropped vectors always name a lower-id dup in their own cluster
    out.filter(_._4 == 0).foreach { r =>
      assert(r._3 >= 0 && r._3 < r._1 && byId(r._3)._2 === r._2)
    }
  }

  test("semDedup hot-cluster cap: inert cap is identical; active cap only ever loses cross-shard pairs") {
    def run(cap: Option[Int]) = Similarity.semDedup(corpus, "vec_id", "embedding",
        threshold = 0.95, nLists = 1, dim = DIM, iters = 1, maxClusterSize = cap)
      .as[(Long, Int, Long, Int)].collect().sortBy(_._1).toSeq
    val un = run(None)
    assert(run(Some(1000)) === un, "cap above the cluster size must be a no-op")
    val capped = run(Some(4)) // 21 vectors → 6 sub-shards
    // capping can only LOSE comparisons: every capped drop was compared in
    // the uncapped run too, so capped-dropped ⊆ uncapped-dropped and each
    // named dup is a genuine uncapped near-dup relation
    val unDropped = un.filter(_._4 == 0).map(_._1).toSet
    capped.filter(_._4 == 0).foreach { r =>
      assert(unDropped.contains(r._1), s"cap invented a drop for ${r._1}")
      assert(r._3 < r._1)
    }
  }

  test("ivfadcTopK: every reported neighbor lies in one of the query's two probed lists") {
    // the scan-confinement contract: candidates (hence results) can only
    // come from the probed inverted lists — recompute the deterministic
    // assignments independently and check every output edge against them
    val q = corpus.filter(col("vec_id") < 3)
    val out = Similarity.ivfadcTopK(q, corpus, "vec_id", "embedding", 5,
        nLists = 4, dim = DIM, ivfIters = 2, m = 4, ksub = 4, pqIters = 2, refine = 8)
      .as[(Long, Long, Double, Int)].collect()
    val cents = Similarity.kmeansCentroids(corpus, "embedding", 4, DIM, 2)
    val assigns = corpus.select(col("vec_id"),
        Similarity.ivfListWith(Similarity.asDouble(col("embedding")), cents).as("c1"),
        Similarity.ivfSecondListWith(Similarity.asDouble(col("embedding")), cents).as("c2"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.nonEmpty)
    out.foreach { case (qid, nid, _, _) =>
      val (q1, q2) = assigns(qid)
      assert(assigns(nid)._1 == q1 || assigns(nid)._1 == q2,
        s"neighbor $nid (list ${assigns(nid)._1}) outside query $qid's probes ($q1, $q2)")
    }
  }

  test("ivfadcTopK with refine = corpus size reproduces IVF-learned exactly (ADC only cuts)") {
    // with the ADC cut disabled (refine >= |corpus|) the exact re-rank sees
    // every probed-list candidate, so the result must equal the learned-IVF
    // path at equal nprobe — proving the PQ stage composes without
    // changing the inverted-list semantics
    val q = corpus.filter(col("vec_id") < 3)
    val ivf = Similarity.ivfTopKLearned(q, corpus, "vec_id", "embedding", 5,
        nLists = 4, dim = DIM, iters = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val ivfadc = Similarity.ivfadcTopK(q, corpus, "vec_id", "embedding", 5,
        nLists = 4, dim = DIM, ivfIters = 2, m = 4, ksub = 4, pqIters = 2, refine = 100)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(ivfadc === ivf)
  }

  test("ivfadc residual codes are m small ints; reconstruction beats raw-PQ reconstruction error") {
    // residual quantization is the point of IVFADC: centroid + coded
    // residual should reconstruct closer than coding the raw vector with
    // the same budget (aggregate L2 across the corpus)
    val (encoded, _) = Similarity.ivfadcEncode(corpus, "vec_id", "embedding",
      nLists = 4, dim = DIM, ivfIters = 2, m = 4, ksub = 4, pqIters = 2)
    val rows = encoded.select(col("neighbor_id"), col("code"), col("cv"), col("recon"))
      .as[(Long, Seq[Int], Seq[Double], Seq[Double])].collect()
    assert(rows.forall(_._2.size == 4))
    assert(rows.forall(_._2.forall(c => c >= 0 && c < 4)))
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val residErr = rows.map(r => l2(r._3, r._4)).sum
    val cbRaw = Similarity.pqCodebooks(corpus, "embedding", 4, 4, DIM, 2)
    val rawErr = corpus.select(Similarity.asDouble(col("embedding")).as("cv"))
      .withColumn("recon", Similarity.pqReconstruct(
        Similarity.pqCodes(col("cv"), cbRaw, DIM), cbRaw))
      .as[(Seq[Double], Seq[Double])].collect()
      .map { case (cv, rc) => l2(cv, rc) }.sum
    assert(residErr < rawErr,
      f"residual coding error $residErr%.4f not below raw coding error $rawErr%.4f")
  }

  test("screenSemantic: scaled copy of a bench vector flags at cosine 1, bench broadcasts") {
    // bench = vec 0; vec 1 is its scaled copy (cosine 1 -> flagged),
    // vec 2 is its negation (cosine -1 -> clean)
    val screen = Similarity.screenSemantic(
      corpus.filter(col("vec_id") =!= 0L), corpus.filter(col("vec_id") === 0L),
      "vec_id", "embedding", threshold = 0.9)
    val rows = screen.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(rows.size == 20, "every corpus vector must be screened")
    assert(rows(1L) == ((0L, 1.0, true)))
    assert(rows(2L)._2 == -1.0 && !rows(2L)._3)
    val plan = screen.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"bench side not broadcast:\n$plan")
    assert(!plan.contains("Window"), s"argmax must be an aggregate, not a window:\n$plan")
  }

  test("sq codes are bytes in [0, 255] with min->0 and max->255 per dim") {
    val (mins, maxs) = Similarity.sqMinMax(corpus, "embedding", DIM)
    assert(mins.size == DIM && maxs.size == DIM)
    assert(mins.indices.forall(i => mins(i) <= maxs(i)))
    val enc = corpus.select(
        Similarity.sqCodes(Similarity.asDouble(col("embedding")), mins, maxs).as("code"))
      .as[Seq[Int]].collect()
    assert(enc.forall(_.size == DIM))
    assert(enc.forall(_.forall(c => c >= 0 && c <= 255)))
    // the corpus min of each dim codes to 0 and the max to 255
    val byDim = enc.map(_.toArray).transpose
    assert(byDim.forall(cs => cs.min == 0 && cs.max == 255))
  }

  test("sq reconstruction error is bounded by one quantization step per dim") {
    val (mins, maxs) = Similarity.sqMinMax(corpus, "embedding", DIM)
    val rows = corpus.select(
        Similarity.asDouble(col("embedding")).as("v"),
        Similarity.sqReconstruct(
          Similarity.sqCodes(Similarity.asDouble(col("embedding")), mins, maxs),
          mins, maxs).as("r"))
      .as[(Seq[Double], Seq[Double])].collect()
    rows.foreach { case (v, r) =>
      v.indices.foreach { i =>
        val step = (maxs(i) - mins(i)) / 255.0
        assert(math.abs(v(i) - r(i)) <= step + 1e-12,
          s"dim $i: |${v(i)} - ${r(i)}| > step $step")
      }
    }
  }

  test("sqTopK with refine = corpus size reproduces brute force exactly") {
    val q = corpus.filter(col("vec_id") < 3)
    val bf = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val sq = Similarity.sqTopK(q, corpus, "vec_id", "embedding", 5, DIM, refine = 100)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(sq === bf)
  }

  test("sqTopK recall@5 with tight refine: int8 ADC ranks the scaled copy first") {
    val q = corpus.filter(col("vec_id") === 0L)
    val sq = Similarity.sqTopK(q, corpus, "vec_id", "embedding", 5, DIM, refine = 5)
      .as[(Long, Long, Double, Int)].collect()
    // 8-bit reconstructions are accurate enough that the cosine-1 scaled
    // copy survives a refine cut of 5 and ranks first
    assert(sq.find(_._4 == 1).get._2 == 1L)
  }
}
