package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash60

/** Weighted sampling without replacement — Efraimidis & Spirakis 2006
  * (public paper): draw k rows with inclusion probability proportional to a
  * per-row weight, in ONE pass with no global shuffle of the data.
  *
  * Each row gets the key ln(u)/w with u uniform in (0, 1]; the k LARGEST
  * keys are exactly a weight-proportional sample without replacement. With
  * weight = token count this is the curation staple "sample a k-document
  * subset whose selection is token-mass-uniform" (a uniform doc sample
  * over-represents short documents).
  *
  * Scale shape: the key is a row-local codegen projection and selection is
  * `TakeOrdered` — per-partition top-k heaps, driver merges |partitions|·k
  * candidate rows, nothing else moves. Determinism: u derives from the
  * shared 60-bit md5 hash of (seed, id), so membership is a pure function
  * of row identity — reproducible across runs, engines, and cluster
  * layouts; ties (impossible in practice with 60-bit u, but defined anyway)
  * break by id. For k beyond driver comfort (~10^6) compose the existing
  * salted two-stage top-k instead; for a gate-scale k this IS the plan a
  * 1000-executor cluster wants.
  */
object WeightedSample {

  /** The A-ES key ln(u)/w as a Column; u = (hash60(seed#id)+1)/2^60 ∈ (0,1].
    * Both factors are replayed verbatim by the SQL oracle; ln is the same
    * IEEE transcendental the gate-green LM-scoring family already shares
    * cross-engine.
    */
  def esKey(id: Column, weight: Column, seed: String): Column = {
    val u = (hash60(concat(lit(s"$seed#"), id.cast("string"))) + lit(1L))
      .cast("double") / lit(math.pow(2, 60))
    val w = when(weight.isNull || weight <= 0,
        raise_error(concat(lit("sampleByWeight: non-positive weight for id "),
          id.cast("string"))))
      .otherwise(weight.cast("double"))
    log(u) / w
  }

  /** Select the k rows with the largest A-ES keys (weight-proportional
    * sample without replacement). Output keeps the input columns and adds
    * `es_key` (6-dp pinned, for evidence); selection itself compares full-
    * precision keys, ties by ascending id.
    */
  def sampleByWeight(
      df: DataFrame,
      id: Column,
      weight: Column,
      k: Int,
      seed: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val keyed = df.withColumn("es_key", esKey(id, weight, seed))
    keyed
      .orderBy(col("es_key").desc, id.asc)
      .limit(k)
      .withColumn("es_key", round(col("es_key"), 6))
  }
}
