package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash60

/** Bloom-filter membership screen — the constant-space complement to the
  * banded near-dup screens: "has this EXACT content been seen in the base
  * corpus?" answered per probe row with zero joins against the corpus.
  *
  * At 100 TB the exact alternative is an anti-join of every arriving batch
  * against the full corpus fingerprint table — a shuffle whose big side is
  * the corpus. The bloom bitmap replaces that with k bit-tests against a
  * broadcast array: false positives at a sized-for rate, NO false negatives,
  * and the bitmap build itself is one hash-shuffle bounded by m/32 reducer
  * keys. Sizing rule: m ≈ n·k/ln2 bits for the target FP rate 2^-k; a
  * 10^9-doc corpus at k=5 is ~0.9 GB of bitmap — broadcastable; beyond
  * that, [[probeJoin]] keeps the bitmap as a (word → bits) frame and
  * probes through a join on the bounded word axis instead of collecting.
  *
  * Cross-engine contract (shared verbatim with the DuckDB oracle): the item
  * key is `md5(text)`; h1 = hash60(fp), h2 = hash60(fp || "#2"); stride =
  * h2 mod (m-1) + 1 (never 0); position_i = (h1 + i·stride) mod m for
  * i = 0..k-1 (Kirsch–Mitzenmacher double hashing — two hashes give k
  * independent-enough probes). Words are 32 bits wide stored in BIGINT so
  * no engine ever touches the sign bit.
  */
object Bloom {

  val WORD_BITS = 32

  /** h1, stride columns for an fp column — the shared position arithmetic. */
  private def hashPair(fp: Column, mBits: Int): (Column, Column) = {
    val h1 = hash60(fp)
    val stride = pmod(hash60(concat(fp, lit("#2"))), lit(mBits - 1)) + 1
    (h1, stride)
  }

  private def position(h1: Column, stride: Column, i: Int, mBits: Int): Column =
    pmod(h1 + lit(i.toLong) * stride, lit(mBits))

  /** The bitmap as a (w: word index, bits: BIGINT with 32 live bits) frame:
    * explode each base fingerprint to its k positions, one hash-shuffle on
    * the word axis (≤ m/32 keys) with map-side partial `bit_or`. This IS
    * the partitioned representation a 100 TB bitmap lives in — build once
    * per corpus release, persist, probe many.
    */
  def bitmap(base: DataFrame, fpCol: Column, mBits: Int, k: Int): DataFrame = {
    require(mBits % WORD_BITS == 0, s"mBits must be a multiple of $WORD_BITS")
    val (h1, stride) = hashPair(fpCol, mBits)
    val positions = array((0 until k).map(i => position(h1, stride, i, mBits)): _*)
    base.select(explode(positions).as("p"))
      .groupBy((col("p") / WORD_BITS).cast("int").as("w"))
      .agg(expr(s"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % $WORD_BITS AS INT)))").as("bits"))
  }

  /** Probe through a join on the word axis — the beyond-broadcast scale
    * path. Each probe row explodes to k (word, bit) probes, left-joins the
    * bitmap frame (missing word ≡ all-zero bits), and a row is a hit iff
    * ALL k bits are set. The join's build side is the bitmap (≤ m/32 rows
    * — broadcast when it fits, shuffle on the bounded word axis when not).
    */
  def probeJoin(bits: DataFrame, probe: DataFrame, idCol: String, fpCol: Column,
      mBits: Int, k: Int): DataFrame = {
    val (h1, stride) = hashPair(fpCol, mBits)
    val positions = array((0 until k).map(i => position(h1, stride, i, mBits)): _*)
    probe.select(col(idCol), explode(positions).as("p"))
      .withColumn("w", (col("p") / WORD_BITS).cast("int"))
      .join(broadcast(bits), Seq("w"), "left")
      .withColumn("hit",
        expr(s"coalesce(shiftright(bits, CAST(p % $WORD_BITS AS INT)) & 1, 0) = 1"))
      .groupBy(col(idCol))
      .agg(expr("bool_and(hit)").as("bloom_hit"))
  }

  /** Collect the bitmap into a dense word array (driver-side, bounded by
    * m/32 — sized by the CALLER's mBits choice, the documented broadcast
    * ceiling is ~1 GB ≈ m = 2^33). Missing words densify to 0.
    */
  def collectWords(bits: DataFrame, mBits: Int): Array[Long] = {
    val words = new Array[Long](mBits / WORD_BITS)
    bits.collect().foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** The deployment hot path: probe against a broadcast word array with
    * ZERO joins and zero shuffles — k `element_at`/shift/AND bit-tests per
    * row, all inside whole-stage codegen. The k positions are projected as
    * named columns once so the bit tests share the h1/stride arithmetic.
    * Output = every probe column + `bloom_hit`, one row per input row.
    */
  def probeBroadcast(words: Array[Long], probe: DataFrame,
      fpCol: Column, mBits: Int, k: Int): DataFrame = {
    require(words.length == mBits / WORD_BITS, "word array does not match mBits")
    val inCols = probe.columns.toSeq
    val (h1, stride) = hashPair(fpCol, mBits)
    val posCols = (0 until k).map(i => position(h1, stride, i, mBits).as(s"__p$i"))
    val withPos = probe.select(inCols.map(col) ++ posCols: _*)
      .withColumn("__words", typedLit(words.toSeq))
    val hit = (0 until k)
      .map(i => expr(
        s"(element_at(__words, CAST(__p$i / $WORD_BITS AS INT) + 1)" +
          s" & shiftleft(CAST(1 AS BIGINT), CAST(__p$i % $WORD_BITS AS INT))) != 0"))
      .reduce(_ && _)
    withPos.select(inCols.map(col) :+ hit.as("bloom_hit"): _*)
  }
}
