package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash60

/** Deterministic corpus shuffle (beyond-reference training-data op): assign
  * every row a position in a pseudo-random permutation of 0..N−1 that is a
  * PURE FUNCTION of (id, seed) — the property a resumable/reproducible
  * pretraining run needs (same corpus + seed ⇒ same batch order on any
  * cluster layout) — WITHOUT the global sort a naive
  * `orderBy(hash).row_number()` plan pays (one corpus-sized sorting task).
  *
  * Two-stage shape, same discipline as the AUC ranks and top-k:
  *   1. rows hash into `nBuckets` buckets; the bucket histogram is one
  *      map-side-combined aggregate (≤ nBuckets rows shuffled, ≤ nBuckets
  *      scalars to the driver — the bounded-axis pattern) from which bucket
  *      base offsets are a prefix sum;
  *   2. within-bucket ranks come from a window partitioned BY BUCKET — the
  *      sort unit is corpus/nBuckets, tunable until it fits an executor.
  * position = offset(bucket) + within-bucket rank. Collisions tie-break on
  * id, so the permutation is total and deterministic.
  */
object CorpusShuffle {

  def shufflePositions(
      df: DataFrame,
      idCol: String,
      seed: String = "0",
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .withColumn("__h", hash60(concat(lit(seed), lit("#"), col(idCol).cast("string"))))
      .withColumn("__bucket", pmod(col("__h"), lit(nBuckets.toLong)).cast("int"))
    val counts = hashed.groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // prefix-sum offsets: bucket b starts at Σ counts of buckets < b
    val offsets = {
      var acc = 0L
      counts.map { case (b, n) => val o = (b, acc); acc += n; o }
    }
    val offDf = offsets.toSeq.toDF("__bucket", "__off")
    val w = Window.partitionBy(col("__bucket")).orderBy(col("__h"), col(idCol))
    hashed
      .join(broadcast(offDf), Seq("__bucket"))
      .withColumn("shuffle_pos", col("__off") + row_number().over(w) - 1)
      .drop("__h", "__bucket", "__off")
  }
}
