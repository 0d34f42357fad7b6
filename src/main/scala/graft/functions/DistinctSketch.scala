package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash60

/** Distinct-count sketches as pure DataFrame aggregations, completing the
  * repo's mergeable-summaries family ([[CountMin]] frequency, Misra-Gries
  * [[HeavyHitters]], [[graft.dedup.Bloom]] membership): HyperLogLog
  * (Flajolet et al. 2007) answers "how many distinct" in m registers, and
  * the KMV / theta bottom-k sketch (Bar-Yossef et al. 2002, Beyer et al.
  * 2007) answers distinct-count AND set-operation estimates (union /
  * intersection / Jaccard between groups) from k retained hash values per
  * group.
  *
  * Spark-first shape (both sketches):
  *   - the sketch IS a DataFrame — (grp, bucket, reg) register cells for
  *     HLL, (grp, h) retained minima for KMV — never a driver-side object;
  *   - building is one scan + one aggregate whose key space is bounded
  *     (m registers / k minima per group), so map-side partial aggregation
  *     collapses each task's contribution before the shuffle: at 100 TB
  *     the shuffle moves O(groups·m) rows, not the item axis. The KMV
  *     bottom-k runs on [[graft.plans.TopKPerKey]] — the custom bounded-
  *     heap physical operator — so no per-group sort ever materializes;
  *   - merging sketches (cross-shard, cross-day, streaming micro-batches)
  *     is register-wise MAX (HLL) / union + re-min-k (KMV) on the same
  *     bounded axis: the mergeable-summaries property falls out of the
  *     representation, which is exactly what the streaming gate exercises.
  *
  * Determinism (the oracle discipline): items hash through the repo's
  * cross-engine 60-bit md5-prefix `hash60`; every derived quantity stays
  * in EXACT integer arithmetic — bucket = h mod m, rank = count-trailing-
  * zeros + 1 via `bit_count((w & -w) - 1)` (the lsb-mask identity; no
  * float log anywhere), the HLL harmonic sum is kept scaled by 2^55 so it
  * is an order-independent BIGINT, and the KMV estimator is one IEEE
  * division of two exact values. A DuckDB oracle rebuilds every register
  * and minimum bit-for-bit and the estimates match bitwise. The
  * small-range linear-counting correction (m·ln(m/V)) is deliberately NOT
  * folded into the reported estimate: `ln` is a libm call with no
  * cross-engine bit guarantee, so the gate reports the raw HLL estimate
  * plus the exact (v_empty, z_scaled) state a consumer needs to apply any
  * correction — the REGISTERS are the sketch; corrections are a reader-
  * side policy.
  */
object DistinctSketch {

  /** Register count m = 2^P. m = 64 keeps the per-group state one cache
    * line per engine-side row group while exercising real multi-register
    * harmonics at gate scale; production would raise P, nothing else
    * changes.
    */
  val HLL_P = 6
  val HLL_M: Int = 1 << HLL_P // 64
  /** hash60 yields 60 bits; P index bits leave 54 rank-payload bits, so
    * ranks span 1..54 with 55 reserved for the all-zero payload.
    */
  val HLL_RANK_BITS: Int = 60 - HLL_P // 54
  private val MAX_RANK = HLL_RANK_BITS + 1 // 55

  /** alpha_64 · m² · 2^55 — the raw-estimate numerator, one double literal
    * shared verbatim with the oracle so est = C / z_scaled is a single
    * identically-rounded IEEE division in both engines.
    */
  val HLL_EST_NUMERATOR: Double =
    0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * math.pow(2, MAX_RANK)

  /** Per-group HLL register table: (grp, bucket, reg) with reg = max rank
    * seen in that bucket; absent buckets are rank 0 (sparse). One explode-
    * free scan + one aggregate on the (grp, bucket) axis (≤ groups·m keys).
    * `salt` namespaces the hash so co-existing sketches decorrelate.
    */
  def hllRegisters(df: DataFrame, grpCol: Column, itemCol: Column,
      salt: String): DataFrame = {
    val h = hash60(concat(lit(s"$salt#"), itemCol))
    df.select(grpCol.as("grp"), pmod(h, lit(HLL_M.toLong)).as("bucket"),
        shiftright(h, HLL_P).as("w")) // exact: top 54 bits
      .select(col("grp"), col("bucket"),
        when(col("w") === 0, lit(MAX_RANK))
          .otherwise(expr("CAST(bit_count((w & -w) - 1) AS INT) + 1"))
          .cast("int").as("rank"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rank")).as("reg"))
  }

  /** Union of all groups' sketches: register-wise max — bit-identical to
    * the sketch that would have been built over the concatenated groups,
    * which is the property the streaming/cross-shard merge relies on.
    */
  def hllMergeAll(registers: DataFrame, label: String = "ALL"): DataFrame =
    registers.groupBy(col("bucket"))
      .agg(max(col("reg")).as("reg"))
      .select(lit(label).as("grp"), col("bucket"), col("reg"))

  /** Collapse a register table to per-group state + raw estimate:
    * v_empty = # absent buckets, z_scaled = Σ_j 2^(55−reg_j) over all m
    * buckets (absent ⇒ reg 0 ⇒ term 2^55) — an exact BIGINT ≤ m·2^55, so
    * reduction order cannot perturb it — and est = C / z_scaled rounded
    * to 6 dp.
    */
  def hllSummary(registers: DataFrame): DataFrame =
    registers
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).cast("int").as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $MAX_RANK - reg)")).as("z_present"))
      .select(
        col("grp"),
        (lit(HLL_M) - col("n_buckets")).as("v_empty"),
        (col("z_present") +
          (lit(HLL_M.toLong) - col("n_buckets")) * lit(1L << MAX_RANK))
          .as("z_scaled"))
      .select(col("grp"), col("v_empty"), col("z_scaled"),
        round(lit(HLL_EST_NUMERATOR) / col("z_scaled").cast("double"), 6)
          .as("est"))

  /** Per-group KMV sketch: the k smallest distinct item hashes, via the
    * bounded-heap [[graft.plans.TopKPerKey]] operator — each input
    * partition forwards ≤ k rows per group, no per-group sort. Output
    * (grp, h), ≤ k rows per group.
    */
  def kmvSketch(df: DataFrame, grpCol: Column, itemCol: Column, k: Int,
      salt: String): DataFrame = {
    require(k >= 2, s"KMV needs k>=2, got $k")
    val hashed = df
      .select(grpCol.as("grp"), hash60(concat(lit(s"$salt#"), itemCol)).as("h"))
      .distinct()
    graft.plans.TopKPerKey(hashed, Seq("grp"), Seq(("h", true)), k)
  }

  /** Pairwise set-operation estimates from a KMV sketch frame (the theta-
    * sketch combination rule): for each group pair a<b, the k smallest of
    * sketchA ∪ sketchB give kk retained values with threshold h_k; the
    * distinct-union estimate is (kk−1)·2^60 / h_k (exact kk when the union
    * sketch did not fill), the Jaccard estimate is the fraction of
    * retained values present in BOTH sketches, and the intersection
    * estimate is their product. The pair axis is C(|groups|, 2) — sketch
    * frames are ≤ groups·k rows by construction, so every join below is a
    * broadcast over bounded frames; nothing item-sized survives past
    * [[kmvSketch]].
    */
  def kmvPairEstimates(sketch: DataFrame, k: Int): DataFrame = {
    val grps = sketch.select(col("grp")).distinct()
    val pairs = grps.select(col("grp").as("source_a"))
      .join(grps.select(col("grp").as("source_b")),
        col("source_a") < col("source_b"))
    val candA = pairs.join(broadcast(sketch), col("source_a") === col("grp"))
      .select(col("source_a"), col("source_b"), col("h"))
    val candB = pairs.join(broadcast(sketch), col("source_b") === col("grp"))
      .select(col("source_a"), col("source_b"), col("h"))
    val unionK = graft.plans.TopKPerKey(
      candA.unionByName(candB).distinct(),
      Seq("source_a", "source_b"), Seq(("h", true)), k)
    val inA = sketch.select(col("grp").as("source_a"), col("h"),
      lit(1L).as("in_a"))
    val inB = sketch.select(col("grp").as("source_b"), col("h"),
      lit(1L).as("in_b"))
    val flagged = unionK
      .join(broadcast(inA), Seq("source_a", "h"), "left")
      .join(broadcast(inB), Seq("source_b", "h"), "left")
    val agg = flagged.groupBy(col("source_a"), col("source_b")).agg(
      count(lit(1)).as("kk"),
      max(col("h")).as("h_k"),
      sum(coalesce(col("in_a"), lit(0L)) * coalesce(col("in_b"), lit(0L)))
        .as("n_both"))
    // (k-1)·2^60 exceeds BIGINT for k>8 — held as an exact double (a small
    // int times a power of two); the division is one IEEE op either way
    val unionEst = when(col("kk") < k, col("kk").cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2, 60)) /
        col("h_k").cast("double"))
    val jaccEst = col("n_both").cast("double") / col("kk").cast("double")
    agg.select(col("source_a"), col("source_b"),
      col("kk").cast("int").as("kk"),
      col("n_both").cast("bigint").as("n_both"),
      round(unionEst, 6).as("union_est"),
      round(jaccEst, 6).as("jacc_est"),
      round(jaccEst * unionEst, 6).as("inter_est"))
  }
}
