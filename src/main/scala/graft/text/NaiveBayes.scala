package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus document classifier: multinomial Naive Bayes with add-one
  * smoothing (beyond-reference training-data op). This is the workhorse
  * role fastText plays in CCNet/CC-style pipelines — language ID against a
  * labeled seed set, or a GPT-3-style quality classifier trained on
  * "known-good vs known-bad" sources — expressed as pure count aggregates
  * so both training and inference stay declarative Spark plans (no ML
  * runtime, no driver-side model object).
  *
  * Math (per test doc d with tokens t_i, n_d total, label l):
  *     score(d,l) = ln(N_l/N) + Σ_i ln((c_{l,t_i}+1)/(T_l+V))
  *                = ln(N_l/N) + Σ_i ln(c_{l,t_i}+1) − n_d·ln(T_l+V)
  * The second form is what we compute: unseen (label, token) pairs have
  * ln(0+1) = 0, so the per-token table only needs SEEN pairs — the model
  * stays sparse and the scoring join is an inner join.
  *
  * Scale shape: training is three map-side-combined aggregates over the
  * token axis (model counts, per-label totals, vocabulary scalar) — no
  * driver collect; the L-row label frame (priors + denominators)
  * broadcasts; scoring joins test tokens against the sparse model on the
  * well-spread token key, aggregates per (doc, label), and the argmax is a
  * row_number window partitioned on doc id with exactly L rows per key.
  * The model lives as a DataFrame end to end — at 100 TB the vocabulary
  * shards across executors instead of being collected anywhere.
  */
object NaiveBayes {

  /** The full scored frame: one row per (test id, label) with the joint
    * log-likelihood — [[classify]]'s argmax input, exposed for consumers
    * that need the whole posterior surface (e.g. the confident-learning
    * screen in [[LabelNoise]]).
    */
  def scores(train: DataFrame, test: DataFrame, idCol: String,
      labelCol: String, textCol: String): DataFrame = {
    val tr = train.select(col(labelCol).as("label"), split(col(textCol), " ").as("t"))
    val trTok = tr.select(col("label"), explode(col("t")).as("tok"))
    val model = trTok.groupBy(col("label"), col("tok"))
      .agg(log(count(lit(1)).cast("double") + 1).as("lw"))
    val labels = tr.groupBy(col("label")).agg(count(lit(1)).as("nl"))
      .join(trTok.groupBy(col("label")).agg(count(lit(1)).as("tot")), Seq("label"))
      .crossJoin(tr.agg(count(lit(1)).as("n")))
      .crossJoin(trTok.agg(countDistinct(col("tok")).as("v")))
      .select(col("label"),
        log(col("nl").cast("double") / col("n")).as("prior"),
        log((col("tot") + col("v")).cast("double")).as("denom"))
    val te = test.select(col(idCol).as("id"), split(col(textCol), " ").as("t"))
    val sparseSums = te.select(col("id"), explode(col("t")).as("tok"))
      .join(model, Seq("tok"))
      .groupBy(col("id"), col("label")).agg(sum(col("lw")).as("s"))
    te.select(col("id"), size(col("t")).as("n_toks"))
      .crossJoin(broadcast(labels))
      .join(sparseSums, Seq("id", "label"), "left")
      .withColumn("score",
        col("prior") + coalesce(col("s"), lit(0.0)) - col("n_toks") * col("denom"))
      .select(col("id"), col("label"), col("score"))
  }

  /** Train on `train` (labeled) and classify `test`: returns
    * (id, pred, nb_score) where pred is the argmax label and nb_score its
    * joint log-likelihood rounded to 6 (ties broken by smallest label).
    */
  def classify(train: DataFrame, test: DataFrame, idCol: String,
      labelCol: String, textCol: String): DataFrame = {
    val scored = scores(train, test, idCol, labelCol, textCol)
    val w = Window.partitionBy(col("id"))
      .orderBy(round(col("score"), 6).desc, col("label"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("label").as("pred"),
        round(col("score"), 6).as("nb_score"))
  }
}
