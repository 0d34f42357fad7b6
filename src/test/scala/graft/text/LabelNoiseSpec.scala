package graft.text

import graft.SparkTestBase

class LabelNoiseSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def r(d: Double, s: Int): Double =
    BigDecimal(d).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver-side replay of the full screen chain. */
  private def replay(
      scores: Seq[(Long, String, Double)],
      observed: Map[Long, String]): Map[Long, (String, String, Option[Double], Boolean)] = {
    val byId = scores.groupBy(_._1)
    val p = byId.flatMap { case (id, rows) =>
      val mxs = rows.map(_._3).max
      val praw = rows.map { case (_, l, s) => l -> r(math.exp(s - mxs), 9) }
      val z = praw.map(x => BigDecimal(x._2)).sum
      praw.map { case (l, pr) => (id, l, r(pr / z.toDouble, 6)) }
    }.toSeq
    val thr = p.filter { case (id, l, _) => observed(id) == l }
      .groupBy(_._2)
      .map { case (l, g) =>
        l -> r(g.map(x => BigDecimal(x._3)).sum.toDouble / g.size, 6) }
    observed.map { case (id, y) =>
      val cands = p.filter(x => x._1 == id && thr.get(x._2).exists(x._3 >= _))
      if (cands.isEmpty) id -> (y, y, None, false)
      else {
        val best = cands.maxBy(x => (x._3, x._2))
        id -> (y, best._2, Some(best._3), best._2 != y)
      }
    }
  }

  test("planted mislabeled example is flagged with the right suggestion") {
    // e2 is observed 'a' but its scores put nearly all mass on 'b'
    val scores = Seq[(Long, String, Double)](
      (1L, "a", -1.0), (1L, "b", -6.0), (1L, "c", -7.0),
      (2L, "a", -5.5), (2L, "b", -1.0), (2L, "c", -6.0),
      (3L, "a", -6.0), (3L, "b", -1.2), (3L, "c", -5.0),
      (4L, "a", -7.0), (4L, "b", -6.5), (4L, "c", -0.9))
    val observed = Map(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "c")
    val got = LabelNoise.screen(
        scores.toDF("id", "label", "score"),
        observed.toSeq.toDF("id", "y"))
      .as[(Long, String, String, Option[Double], Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(got(2L)._2 == "b" && got(2L)._4, "noisy e2 must be flagged as b")
    assert(!got(1L)._4 && !got(3L)._4 && !got(4L)._4)
    assert(got == replay(scores, observed))
  }

  test("no qualifying class keeps the observed label, unflagged, null p") {
    // e2's mass is spread so no class reaches its self-confidence mean
    val scores = Seq[(Long, String, Double)](
      (1L, "a", -0.1), (1L, "b", -9.0),
      (2L, "a", -5.0), (2L, "b", -5.0),
      (3L, "a", -9.0), (3L, "b", -0.1))
    val observed = Map(1L -> "a", 2L -> "a", 3L -> "b")
    val got = LabelNoise.screen(
        scores.toDF("id", "label", "score"), observed.toSeq.toDF("id", "y"))
      .as[(Long, String, String, Option[Double], Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(got == replay(scores, observed))
    assert(got(2L) == (("a", "a", None, false)))
  }

  test("full-chain agreement on a spread of scores") {
    val labels = Seq("a", "b", "c")
    val scores = for (id <- 0L until 30L; (l, j) <- labels.zipWithIndex)
      yield (id, l, -1.0 - ((id * 7 + j * 13) % 29) / 5.0)
    val observed = (0L until 30L).map(id => id -> labels((id % 3).toInt)).toMap
    val got = LabelNoise.screen(
        scores.toDF("id", "label", "score"), observed.toSeq.toDF("id", "y"))
      .as[(Long, String, String, Option[Double], Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(got == replay(scores, observed))
  }

  test("oofScores: each row is scored exactly once, by its complement's model") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 24L).map(i =>
      (i, if (i % 2 == 0) "a" else "b",
        if (i % 2 == 0) "apple apple fruit" else "rock stone rock"))
      .toDF("id", "y", "text")
    val oof = LabelNoise.oofScores(docs, "id", "y", "text", nFolds = 3)
    // coverage: every (id, label) cell exactly once, both labels per id
    val cells = oof.groupBy("id").count().collect().map(r => r.getLong(1))
    assert(cells.length == 24 && cells.forall(_ == 2L))
    // equality with the manual per-fold construction
    val fold = pmod(TextFunctions.hash60(col("id").cast("string")), lit(3L))
    val manual = (0 until 3).map { f =>
      NaiveBayes.scores(docs.withColumn("__f", fold).filter(col("__f") =!= f),
        docs.withColumn("__f", fold).filter(col("__f") === f), "id", "y", "text")
    }.reduce(_ unionByName _)
    val a = oof.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted
    val b = manual.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("the OOF screen still flags a planted flip on separable content") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 24L).map { i =>
      val trueLang = if (i % 2 == 0) "a" else "b"
      val obs = if (i == 6L) "b" else trueLang // planted flip on an 'a' doc
      (i, obs, if (i % 2 == 0) "apple apple fruit pear" else "rock stone rock slate")
    }.toDF("id", "y", "text")
    val sc = LabelNoise.oofScores(docs, "id", "y", "text", nFolds = 3)
    val out = LabelNoise.screen(sc, docs.select(col("id"), col("y")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(6L), "the planted flip must be flagged out-of-fold")
  }
}
