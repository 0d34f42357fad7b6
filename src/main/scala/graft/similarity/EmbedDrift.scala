package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-distribution drift between two corpus slices — the vector
  * analog of [[graft.text.DriftCard]]'s token drift: per group, the L2
  * distance between the two slices' MEAN embeddings (the first-moment
  * term of MMD with a linear kernel — the cheap screen that catches
  * encoder swaps, upstream preprocessing changes, and topic shift
  * before an ANN index or SemDeDup threshold silently degrades).
  *
  * Scale shape: each side is one map-side-combined aggregate to the
  * (group, dimension) axis — |groups|·d rows regardless of corpus size —
  * joined on that bounded axis and reduced to |groups| rows. Per-dimension
  * means are 6-dp-pinned (the k-means-centroid discipline) BEFORE the
  * difference, so both engines square identical operands; the d-term sum
  * of squared diffs is an exact-decimal reduction (each term is a product
  * of two 6-dp decimals — scale 12, no rounding), with ONE IEEE sqrt at
  * the end.
  *
  * Output: (group, n_a, n_b, shift) — shift rounded to 6 dp.
  */
object EmbedDrift {

  def meanShift(
      a: DataFrame,
      b: DataFrame,
      groupCol: String,
      vecCol: String): DataFrame = {
    def moments(df: DataFrame, nName: String, mName: String): DataFrame =
      df.select(col(groupCol).as("grp"),
          posexplode(Similarity.asDouble(col(vecCol))).as(Seq("pos", "x")))
        .groupBy(col("grp"), col("pos"))
        .agg(count(lit(1)).as(nName),
          round(avg(col("x")), 6).cast("decimal(18,6)").as(mName))
    val ma = moments(a, "na", "m_a")
    val mb = moments(b, "nb", "m_b")
    ma.join(mb, Seq("grp", "pos"))
      .groupBy(col("grp"))
      .agg(
        // every dimension carries the same row count; min = that count
        (min(col("na"))).as("n_a"), (min(col("nb"))).as("n_b"),
        sum((col("m_a") - col("m_b")) * (col("m_a") - col("m_b"))).as("__ss"))
      .select(col("grp").as(groupCol), col("n_a"), col("n_b"),
        round(sqrt(col("__ss").cast("double")), 6).as("shift"))
  }
}
