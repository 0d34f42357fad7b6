package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact distributed quantiles by iterative histogram refinement — the
  * 100 TB shape for "give me the real p99", beyond-reference training-data
  * op (corpus length/score distributions drive filter thresholds, shard
  * sizing, and packing caps).
  *
  * A sort-based exact quantile funnels the corpus through a global
  * `orderBy` (one range-partitioned sort of every row); Spark's built-in
  * `percentile_approx` is cheap but approximate. This operator is exact
  * AND aggregate-only: each round is one map-side-combined `groupBy(state,
  * bucket).count()` scan whose result is ≤ |groups|·|quantiles|·`buckets`
  * rows to the driver (the bounded-axis pattern); the driver walks the
  * histogram, narrows each target's [lo, hi] range by a factor of
  * `buckets`, and re-scans. Integer domains converge in
  * ⌈log_buckets(range)⌉ rounds — 2 scans for token counts, ≤ 7 for the
  * full 63-bit range at the default 1024 buckets — independent of row
  * count, so the plan is identical at sf0.001 and at 100 TB.
  *
  * Rank semantics (replayed exactly by the SQL oracle): the rank-r
  * smallest value with r = max(1, ⌈q·n⌉) — the classic lower/discrete
  * quantile. All range arithmetic is exact 64-bit integer (`div`, no
  * float bucketing), so engine agreement needs no tolerance.
  */
object Quantiles {

  /** One in-flight target: find the `rem`-th smallest `v` in [lo, hi]
    * among rows of group `grp` (rem is the rank re-based to values ≥ lo).
    */
  private final case class St(sid: Int, grp: String, q: Double, rank: Long,
      n: Long, lo: Long, hi: Long, rem: Long) {
    /** Bucket width ⌈range/buckets⌉ — computed in UNSIGNED 64-bit space so a
      * full-span group (lo near Long.MinValue, hi near Long.MaxValue, range
      * beyond 2^63) still refines correctly: hi−lo wraps to the right
      * unsigned value, and ⌈r/b⌉ = ⌊(r−1)/b⌋+1 for r ≥ 1.
      */
    def width(buckets: Int): Long =
      java.lang.Long.divideUnsigned(hi - lo, buckets) + 1
    /** v−lo can exceed Long range for the same full-span groups; Spark 4's
      * ANSI mode turns that wraparound into a runtime error, so those states
      * bucket via exact DECIMAL(20,0) arithmetic instead (rare: only while
      * an interval still spans ≥ 2^63).
      */
    def rangeOverflows: Boolean = (hi - lo) < 0
  }

  /** Exact per-group quantiles of an integer-valued column.
    *
    * @param df      input frame
    * @param group   grouping column (cast to string; use `lit("ALL")` for a
    *                global quantile)
    * @param value   integral value column (cast to long; NULLs are ignored,
    *                matching SQL aggregate semantics)
    * @param qs      quantile fractions in (0, 1]
    * @param buckets histogram resolution per round (driver rows per round
    *                are bounded by |groups|·|qs|·buckets)
    * @return frame (grp, q, rank, n, value) — one row per non-empty group
    *         and quantile, ordered by (grp, q)
    */
  def exactQuantiles(
      df: DataFrame,
      group: Column,
      value: Column,
      qs: Seq[Double],
      buckets: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1]: $qs")
    require(buckets >= 2, s"buckets must be ≥ 2: $buckets")
    val spark = df.sparkSession

    val base = df
      .select(group.cast("string").as("grp"), value.cast("long").as("v"))
      .where(col("v").isNotNull)
      .persist()
    try {
      // One aggregate fixes every group's count and value range.
      val bounds = base.groupBy("grp")
        .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
        .collect()

      var states = Vector.newBuilder[St].result()
      var results = Vector.empty[St] // done states: lo == hi == value
      var sid = 0
      for (r <- bounds.sortBy(_.getString(0)); q <- qs.sorted) {
        val (grp, n) = (r.getString(0), r.getLong(1))
        val (lo, hi) = (r.getLong(2), r.getLong(3))
        // Pure IEEE arithmetic — identical in the JVM and the SQL oracle.
        val rank = math.max(1L, math.ceil(q * n).toLong)
        val st = St(sid, grp, q, rank, n, lo, hi, rank)
        if (lo == hi) results :+= st else states :+= st
        sid += 1
      }

      // Interval width shrinks ≥ buckets× per round, so 63-bit ranges
      // resolve within 7 rounds at 1024 buckets; anything past the bound
      // is a logic error worth failing loudly on, not looping on.
      val maxRounds =
        (63.0 / (math.log(buckets) / math.log(2))).ceil.toInt + 1
      var round = 0
      while (states.nonEmpty) {
        round += 1
        require(round <= maxRounds,
          s"exactQuantiles failed to converge in $maxRounds rounds")
        // Per row, per matching in-flight state: its (sid, bucket) item.
        // `div` keeps the bucket arithmetic in exact 64-bit integers —
        // a double division is off-by-one-prone once ranges pass 2^53.
        val items = states.map { s =>
          val w = s.width(buckets)
          val bucket =
            if (s.rangeOverflows)
              expr(s"(CAST(v AS DECIMAL(20,0)) - (${s.lo}L)) div ${w}L")
            else expr(s"(v - (${s.lo}L)) div ${w}L")
          when(col("grp") === lit(s.grp) &&
               col("v") >= lit(s.lo) && col("v") <= lit(s.hi),
            struct(lit(s.sid).as("sid"), bucket.as("bucket")))
            .otherwise(lit(null))
        }
        val hist = base
          .select(explode(array(items: _*)).as("t"))
          .where(col("t").isNotNull)
          .groupBy(col("t.sid").as("sid"), col("t.bucket").as("bucket"))
          .agg(count(lit(1)).as("c"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (k, rs) =>
            k -> rs.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
          }

        val next = Vector.newBuilder[St]
        for (s <- states) {
          val w = s.width(buckets)
          // Walk ascending buckets to the one containing the target rank.
          var rem = s.rem
          var found: Option[(Long, Long)] = None
          val it = hist.getOrElse(s.sid,
            sys.error(s"no histogram rows for in-flight state $s")).iterator
          while (found.isEmpty && it.hasNext) {
            val (b, c) = it.next()
            if (rem <= c) found = Some((b, rem)) else rem -= c
          }
          val (b, inBucket) = found.getOrElse(
            sys.error(s"rank ${s.rem} exceeds bucket counts for state $s"))
          // lo2 is mathematically in [lo, hi] so two's-complement wraparound
          // in the intermediate b·w product still lands on the exact value;
          // the hi2 clamp compares unsigned for the same reason.
          val lo2 = s.lo + b * w
          val hi2 =
            if (java.lang.Long.compareUnsigned(s.hi - lo2, w - 1) >= 0)
              lo2 + w - 1
            else s.hi
          val s2 = s.copy(lo = lo2, hi = hi2, rem = inBucket)
          if (lo2 == hi2) results :+= s2 else next += s2
        }
        states = next.result()
      }

      val out = results.map(s => Row(s.grp, s.q, s.rank, s.n, s.lo))
      val schema = StructType(Seq(
        StructField("grp", StringType, nullable = false),
        StructField("q", DoubleType, nullable = false),
        StructField("rank", LongType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("value", LongType, nullable = false)))
      spark.createDataFrame(
          spark.sparkContext.parallelize(out, 1), schema)
        .orderBy("grp", "q")
    } finally base.unpersist()
  }

  /** Quantile-threshold corpus filter: keep rows whose `value` is ≥ their
    * group's q-quantile — the "drop the shortest X% per language" curation
    * rule, composed scale-correctly: quantiles come from the aggregate-only
    * refinement above, and the filter is a broadcast-free literal CASE over
    * the bounded group axis (the [[Budget]] pattern) — no join, no window,
    * no sort touches the data rows.
    */
  def filterAboveQuantile(
      df: DataFrame,
      group: Column,
      value: Column,
      q: Double,
      buckets: Int = 1024): DataFrame = {
    val thresholds = exactQuantiles(df, group, value, Seq(q), buckets)
      .select("grp", "value").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val grp = group.cast("string")
    val thr = thresholds.foldLeft(lit(null).cast("long")) {
      case (acc, (g, v)) => when(grp === lit(g), lit(v)).otherwise(acc)
    }
    // An unseen group at filter time (empty at quantile time) has no
    // threshold — surface it rather than silently dropping rows.
    df.where(value.cast("long") >=
      coalesce(thr, raise_error(concat(lit("filterAboveQuantile: no threshold for group "), grp))))
  }
}
