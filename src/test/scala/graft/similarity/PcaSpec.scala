package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("covarianceMatrix matches the hand-computed population covariance") {
    // vectors (1,0), (0,1), (1,1), (0,0): mean (0.5, 0.5)
    // var(x) = var(y) = 0.25; cov(x,y) = E[xy] - 0.25 = 0.25 - 0.25 = 0
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(1f, 1f)), (3L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val c = Pca.covarianceMatrix(df, "embedding", 2)
    assert(c(0)(0) == 0.25 && c(1)(1) == 0.25)
    assert(c(0)(1) == 0.0 && c(1)(0) == 0.0)
  }

  test("moment aggregator equals the explode formulation on a random corpus") {
    val dim = 5
    val df = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(d => math.sin(i * 17 + d * 3).toFloat))
    }.toDF("vec_id", "embedding")
    val agg = Pca.covarianceMatrix(df, "embedding", dim)
    // reference: explicit posexplode² covariance, same op order + rounding
    val x = df.select(col("vec_id"), posexplode(Similarity.asDouble(col("embedding"))).as(Seq("i", "v")))
    val n = df.count().toDouble
    val mu = x.groupBy(col("i")).agg(sum(col("v")).as("s1"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val g = x.as("a").join(x.as("b"), "vec_id")
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.v") * col("b.v")).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (i <- 0 until dim; j <- 0 until dim) {
      val want = Pca.r6(g((i, j)) / n - (mu(i) / n) * (mu(j) / n))
      assert(math.abs(agg(i)(j) - want) < 2e-6, s"cov($i,$j): ${agg(i)(j)} vs $want")
    }
  }

  test("power iteration recovers the dominant direction of an anisotropic cloud") {
    // points spread along (3, 4)/5 with small orthogonal noise: the first
    // principal direction must align with the axis (up to sign)
    val axis = Array(0.6, 0.8)
    val df = (0L until 60L).map { i =>
      val t = math.sin(i * 7.0) * 5.0          // large along-axis coordinate
      val s = math.sin(i * 13.0) * 0.1         // small orthogonal jitter
      (i, Array((t * axis(0) - s * axis(1)).toFloat, (t * axis(1) + s * axis(0)).toFloat))
    }.toDF("vec_id", "embedding")
    val cov = Pca.covarianceMatrix(df, "embedding", 2)
    val comps = Pca.powerComponents(cov, nComps = 2, iters = 12)
    val align = math.abs(comps(0)(0) * axis(0) + comps(0)(1) * axis(1))
    assert(align > 0.999, s"first component misaligned: ${comps(0).toSeq}")
    // second component ~ orthogonal complement; near-unit norm, near-zero dot
    val d01 = comps(0)(0) * comps(1)(0) + comps(0)(1) * comps(1)(1)
    assert(math.abs(d01) < 1e-3, s"components not orthogonal: $d01")
    comps.foreach { v =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-4, s"component norm drifted: $nrm")
    }
  }

  test("project equals the manual dot product, 6-dp-rounded") {
    val df = Seq((0L, Array(1f, 2f, 3f)), (1L, Array(-1f, 0f, 1f))).toDF("vec_id", "embedding")
    val comps = Seq(Array(0.5, 0.5, 0.0), Array(0.0, 0.0, 1.0))
    val out = Pca.project(df, "vec_id", "embedding", comps)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(0L) == ((1.5, 3.0)) && out(1L) == ((-0.5, 1.0)))
  }

  test("pcaTopK with refine = corpus size degenerates to brute force exactly") {
    val dim = 8
    val df = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(d => math.sin(i * 31 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 3)
    val full = Pca.pcaTopK(q, df, "vec_id", "embedding",
      k = 5, refine = 40, dim = dim, nComps = 2, iters = 8)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.bruteForceTopK(q, df, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSet
    assert(full == brute, "refine=corpus must reproduce exact top-k")
  }

  test("pcaTopK shortlist really confines the exact rescoring") {
    val dim = 8
    val df = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(d => math.sin(i * 31 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 2)
    val out = Pca.pcaTopK(q, df, "vec_id", "embedding",
      k = 3, refine = 5, dim = dim, nComps = 2, iters = 8)
    val rows = out.collect()
    // k results per query, ranks contiguous, sims within [-1, 1]
    assert(rows.length == 6)
    assert(rows.groupBy(_.getLong(0)).values.forall(_.map(_.getInt(3)).sorted.sameElements(1 to 3)))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("whitened projections have unit variance along every kept direction") {
    val dim = 4
    // anisotropic: coordinate 0 swings ~10x wider than the rest
    val df = (0L until 200L).map { i =>
      (i, Array.tabulate(dim)(d =>
        (math.sin(i * 13.0 + d) * (if (d == 0) 10.0 else 1.0)).toFloat))
    }.toDF("vec_id", "embedding")
    val w = Pca.whitenedProjections(df, "vec_id", "embedding", dim, 2, 10)
    val stats = w.agg(
      var_pop(col("w0")).as("v0"), var_pop(col("w1")).as("v1"),
      avg(col("w0")).as("m0")).collect().head
    assert(math.abs(stats.getDouble(0) - 1.0) < 0.05, s"w0 var ${stats.getDouble(0)}")
    assert(math.abs(stats.getDouble(1) - 1.0) < 0.05, s"w1 var ${stats.getDouble(1)}")
    // and the definition: w_c == round6(p_c / sqrt(lambda_c))
    val cv = Pca.powerComponentsWithValues(
      Pca.covarianceMatrix(df, "embedding", dim), 2, 10)
    val p = Pca.project(df, "vec_id", "embedding", cv.map(_._1))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val wm = w.collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    wm.foreach { case (id, (w0, w1)) =>
      assert(w0 == Pca.r6(p(id)._1 / math.sqrt(cv(0)._2)))
      assert(w1 == Pca.r6(p(id)._2 / math.sqrt(cv(1)._2)))
    }
  }

  test("quantized recipe is deterministic across repeated runs") {
    val df = (0L until 30L).map { i =>
      (i, Array.tabulate(6)(d => math.sin(i * 3 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val a = Pca.pcaProjections(df, "vec_id", "embedding", 6, 2, 8).collect().map(_.toSeq).toSet
    val b = Pca.pcaProjections(df.repartition(7), "vec_id", "embedding", 6, 2, 8)
      .collect().map(_.toSeq).toSet
    assert(a == b, "projections changed under a different partition layout")
  }
}
