package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash60

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a pure DataFrame
  * aggregation — the constant-space frequency-estimation complement to the
  * EXACT Misra-Gries heavy hitters ([[HeavyHitters]]): MG answers "which
  * tokens are hot" exactly for a ≤ k set; CMS answers "roughly how hot is
  * ANY token" in d·w counters, with one-sided error (never underestimates,
  * overestimates by ≤ εn with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  *
  * Spark-first shape: the sketch IS a DataFrame of (r, c, cnt) counter
  * cells. Building it is one explode + groupBy on the (r, c) axis — a key
  * space bounded by d·w (thousands) regardless of corpus vocabulary, so
  * map-side partial aggregation collapses each task's contribution to
  * ≤ d·w rows before the shuffle. Contrast a full `groupBy(token)`: at
  * 100 TB that shuffles billions of vocabulary keys to answer frequency
  * point queries. Merging two sketches (cross-shard, cross-day) is a
  * union + sum on the same bounded axis — the mergeable-summaries property
  * falls out of the representation for free.
  *
  * Determinism: row r's bucket for token t is
  * `hash60("cms<r>#" + t) mod width` — the repo's cross-engine 60-bit
  * md5-prefix hash, so a DuckDB oracle rebuilds the identical counter
  * matrix cell for cell and the estimates match bitwise.
  */
object CountMin {

  private def bucket(r: Int, tok: Column, width: Int): Column =
    pmod(hash60(concat(lit(s"cms$r#"), tok)), lit(width.toLong))

  /** Build the sketch: one counter cell per (row, bucket) with its count.
    * `tokensCol` is an array column; every element of every row counts.
    * Absent cells are zero (sparse representation).
    */
  def sketch(df: DataFrame, tokensCol: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2; got d=$depth w=$width")
    val toks = df.select(explode(tokensCol).as("token"))
    val rows = (0 until depth).map { r =>
      toks.select(lit(r).as("r"), bucket(r, col("token"), width).as("c"))
    }.reduce(_ unionByName _)
    rows.groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches built with the same (depth, width): cell-wise sum.
    * This is exactly the sketch of the concatenated corpora.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate frequencies for a token frame: est(t) =
    * min over rows r of cnt[r][bucket_r(t)], with absent cells read as 0.
    * The SKETCH side broadcasts — it is ≤ d·w rows by construction, so the
    * probe axis (which may be arbitrarily large: every distinct token of a
    * batch, say) stays distributed and the lookup is a map-side hash probe
    * with zero shuffle on the query side before the per-token min.
    */
  def estimate(sketchDf: DataFrame, queryTokens: DataFrame, tokenCol: String,
      depth: Int, width: Int): DataFrame = {
    val probes = (0 until depth).map { r =>
      queryTokens.select(col(tokenCol).as("token"),
        lit(r).as("r"), bucket(r, col(tokenCol), width).as("c"))
    }.reduce(_ unionByName _)
    probes.join(broadcast(sketchDf), Seq("r", "c"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Equi-join size estimate from two sketches over the join key
    * (Cormode & Muthukrishnan 2005 §4.3 inner-product estimation):
    * |A ⋈_k B| = Σ_v f_A(v)·f_B(v) ≈ min over rows r of the counter dot
    * product Σ_c cntA[r][c]·cntB[r][c] — one-sided (never under-
    * estimates). With A = B this is the F₂ self-join moment, THE skew
    * diagnostic a planner wants before committing to a shuffle join: two
    * d·w-cell frames answer "how big will this join be" without touching
    * either fact table again. Plan: one (r, c) equi-join on the bounded
    * counter axis + a d-row min — all integer arithmetic, no estimate
    * drift across engines.
    */
  def joinSizeEstimate(sketchA: DataFrame, sketchB: DataFrame,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2; got d=$depth w=$width")
    val spark = sketchA.sparkSession
    import spark.implicits._
    // incompatible sketches (different depth/width) would silently join on
    // (r, c) and return a meaningless estimate — verify each cell is in
    // bounds at runtime (round-7 ADVICE fix)
    def checked(s: DataFrame, name: String) = s.select(
      when(col("r") >= 0 && col("r") < depth && col("c") >= 0 && col("c") < width,
        col("r")).otherwise(raise_error(concat(
          lit(s"joinSizeEstimate: $name cell outside d=$depth w=$width: r="),
          col("r").cast("string"), lit(" c="), col("c").cast("string")))).as("r"),
      col("c"), col("cnt"))
    val dots = checked(sketchA, "sketchA").withColumnRenamed("cnt", "ca")
      .join(checked(sketchB, "sketchB").withColumnRenamed("cnt", "cb"), Seq("r", "c"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("dot"))
    // a row with NO overlapping cells has dot product 0 — without the left
    // join its row would vanish from the min (and two disjoint sketches
    // would return an empty frame instead of est=0)
    (0 until depth).toDF("r").join(dots, Seq("r"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est"))
  }
}
