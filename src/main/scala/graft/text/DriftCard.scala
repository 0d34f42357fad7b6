package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift card — per-group divergence between the token
  * distributions of two corpus snapshots (yesterday's dump vs today's,
  * or source A vs source B): the monitoring signal a continuously-ingesting
  * training-data pipeline alarms on ("did this crawl source's language
  * suddenly shift?") before a drifted source poisons a mixture.
  *
  * Two divergences per group over add-1-smoothed unigram distributions on
  * the UNION vocabulary:
  *   - total variation  TV = ½ Σ_w |p_w − q_w| — computed EXACTLY: with
  *     p_w = (cp_w+1)/(np+V), q_w = (cq_w+1)/(nq+V), every |p−q| numerator
  *     (cp+1)(nq+V) − (cq+1)(np+V) is an exact DECIMAL integer over the
  *     common denominator (np+V)(nq+V), so the sum is exact and ONE IEEE
  *     division (plus the /2) produces the score — no transcendentals at
  *     all, bit-identical across engines and reduction orders;
  *   - KL(p‖q) = Σ_w p_w ln(p_w/q_w) — the ratio is formed as ONE division
  *     of two exact decimal products (never ln(p)−ln(q), which would take
  *     two transcendentals per word), each term p·ln(ratio) is pinned at
  *     9 dp and summed as exact DECIMAL(38,9) (the PageRank-contribution
  *     discipline), final pin 6 dp.
  *
  * Scale shape: per-(group, word) counts come from ONE scan per snapshot
  * (map-side-combined — the Zipf-hot word key carries partial counts, not
  * rows); the two vocab-axis frames full-outer-join on (group, word);
  * per-group totals (np, nq, V) are a |groups|-sized aggregate broadcast
  * back; everything after is row-local on the vocab axis. No data row is
  * touched past the first aggregate.
  *
  * Output: (group, v, n_old, n_new, tv, kl) — v the union vocab size,
  * n_old/n_new the snapshot token masses, kl = KL(new‖old).
  */
object DriftCard {

  /** Per-(group, word) occurrence counts — the decomposable frame the
    * drift arithmetic consumes; exposed so the STREAMING variant can merge
    * per-batch partial counts into the same shape.
    */
  private[graft] def tokenCounts(df: DataFrame, groupCol: String,
      textCol: String, cname: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        explode(split(col(textCol), " ")).as("word"))
      .groupBy("grp", "word").agg(count(lit(1)).as(cname))

  def tokenDrift(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      groupCol: String,
      textCol: String): DataFrame =
    driftFromCounts(
      tokenCounts(oldDocs, groupCol, textCol, "cq"),
      tokenCounts(newDocs, groupCol, textCol, "cp"), groupCol)

  /** The drift arithmetic over pre-aggregated (grp, word, count) frames —
    * `cq` = reference snapshot, `cp` = new snapshot.
    */
  private[graft] def driftFromCounts(cqf: DataFrame, cpf: DataFrame,
      groupCol: String): DataFrame = {
    val joined = cqf.join(cpf,
        Seq("grp", "word"), "full_outer")
      .na.fill(0L, Seq("cp", "cq"))
    val totals = joined.groupBy("grp").agg(
      sum(col("cq")).as("nq"), sum(col("cp")).as("np"),
      count(lit(1)).as("v"))
    val t = joined.join(broadcast(totals), "grp")
      .withColumn("dp", col("np") + col("v"))
      .withColumn("dq", col("nq") + col("v"))

    // exact integer cross-products over the common denominator dp·dq
    val a = (col("cp") + 1).cast("decimal(19,0)") * col("dq").cast("decimal(19,0)")
    val b = (col("cq") + 1).cast("decimal(19,0)") * col("dp").cast("decimal(19,0)")
    val pw = (col("cp") + 1).cast("double") / col("dp").cast("double")
    val ratio = a.cast("double") / b.cast("double")
    val term = round(pw * log(ratio), 9).cast("decimal(38,9)")

    t.withColumn("tvnum", abs(a - b))
      .withColumn("klterm", term)
      .groupBy(col("grp").as(groupCol))
      .agg(
        max(col("v")).as("v"),
        max(col("nq")).as("n_old"),
        max(col("np")).as("n_new"),
        max(col("dp")).as("dpv"), max(col("dq")).as("dqv"),
        sum(col("tvnum")).as("tvsum"), sum(col("klterm")).as("klsum"))
      .select(col(groupCol), col("v"), col("n_old"), col("n_new"),
        round(col("tvsum").cast("double") /
          (col("dpv").cast("decimal(19,0)") * col("dqv").cast("decimal(19,0)"))
            .cast("double") / 2.0, 6).as("tv"),
        round(col("klsum").cast("double"), 6).as("kl"))
  }
}
