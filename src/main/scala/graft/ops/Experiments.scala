package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment / association analytics over events and baskets — the
  * hypothesis-testing side of the behavioral family:
  *
  *   - two-proportion z-test (the A/B test readout): pooled-variance
  *     z score for conversion-rate differences, the single most-run
  *     statistical test in product analytics;
  *   - market-basket association rules (support / confidence / lift):
  *     co-occurrence mining with the same bounded-axis discipline as the
  *     containment gate — pairs come from a self-join WITHIN a basket
  *     (cost Σ_basket |basket|², never corpus²);
  *   - first-order event-transition matrix (Markov chain over event
  *     types): the behavioral fingerprint per user journey.
  *
  * All counting is integer; each emitted rate/score is a fixed IEEE
  * chain on integer operands (sqrt is correctly rounded by IEEE 754, so
  * cross-engine equality holds with no pinning games).
  */
object Experiments {

  /** Two-proportion z-test. `assignments` must have one row per unit with
    * `armCol` (two distinct values; arm_a = min, arm_b = max, the same
    * convention as [[oddsRatio]]) and a boolean `convertedCol`. Returns one
    * row: per-arm n/x/rate, absolute difference, pooled z, and significance
    * at the given |z| threshold.
    */
  def abTest(assignments: DataFrame, armCol: Column, convertedCol: Column,
      zCrit: Double = 1.959964): DataFrame = {
    val agg = assignments.groupBy(armCol.as("arm"))
      .agg(count(lit(1)).as("n"), sum(convertedCol.cast("long")).as("x"))
    // deterministic arm selection (round-7 ADVICE fix): min_by/max_by on the
    // arm value instead of orderBy(...).limit(...) chains, whose row-order
    // preservation through a Project is not a guaranteed Spark contract —
    // arm_a = the global min arm, arm_b = the global max arm, matching the
    // oracle's hardcoded arm 0/1 and oddsRatio's max-arm convention.
    val a = agg.agg(min(col("arm")).as("arm_a"),
      min_by(col("n"), col("arm")).as("n_a"), min_by(col("x"), col("arm")).as("x_a"))
    val b = agg.agg(max(col("arm")).as("arm_b"),
      max_by(col("n"), col("arm")).as("n_b"), max_by(col("x"), col("arm")).as("x_b"))
    val pA = col("x_a").cast("double") / col("n_a")
    val pB = col("x_b").cast("double") / col("n_b")
    val pool = (col("x_a") + col("x_b")).cast("double") / (col("n_a") + col("n_b"))
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    // degenerate pools (every unit converted, or none) have zero variance:
    // z is undefined, not infinite — emit null/false instead of an ANSI
    // divide-by-zero task failure
    val zOk = se > lit(0.0)
    a.crossJoin(b).select(
      col("arm_a"), col("n_a"), col("x_a"), round(pA, 6).as("p_a"),
      col("arm_b"), col("n_b"), col("x_b"), round(pB, 6).as("p_b"),
      round(pA - pB, 6).as("diff"),
      when(zOk, round((pA - pB) / se, 6)).as("z"),
      when(zOk, abs((pA - pB) / se) > zCrit).otherwise(lit(false)).as("significant"))
  }

  /** Association rules over (basket, item) rows: canonical item pairs
    * co-occurring in ≥ `minSupport` baskets, both directions' confidence,
    * and lift = n_ab·N / (n_a·n_b) (decimal cross-products — long·long
    * overflows past ~3·10⁹ baskets). Top `topK` by lift.
    */
  def basketRules(basketItems: DataFrame, basketCol: Column, itemCol: Column,
      minSupport: Long, topK: Int): DataFrame = {
    val bi = basketItems.select(basketCol.as("b"), itemCol.as("i")).distinct()
    val nB = bi.agg(countDistinct(col("b")).as("n_baskets"))
    val itemN = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = bi.as("l").join(bi.as("r"), Seq("b"))
      .where(col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val scored = pairs
      .join(itemN.select(col("i").as("item_a"), col("n_i").as("n_a")), Seq("item_a"))
      .join(itemN.select(col("i").as("item_b"), col("n_i").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(nB))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("n_baskets"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_a_to_b"),
        round(col("n_ab").cast("double") / col("n_b"), 6).as("conf_b_to_a"),
        round((col("n_ab").cast("decimal(19,0)") * col("n_baskets").cast("decimal(19,0)"))
          .cast("double") /
          (col("n_a").cast("decimal(19,0)") * col("n_b").cast("decimal(19,0)")).cast("double"), 6)
          .as("lift"))
    scored.orderBy(col("lift").desc, col("item_a"), col("item_b")).limit(topK)
  }

  /** Kaplan–Meier survival over right-censored durations: one row per
    * distinct duration with d (events), c (censored), the at-risk count
    * (suffix sum over the BOUNDED duration axis — the only window, above
    * an aggregate), and S(t) = Π_{t_i ≤ t} (1 − d_i/n_i).
    *
    * Cross-engine: per-step log factors ln(1 − d/n) pin to 9 dp DECIMAL,
    * the cumulative sum is exact (and emitted as `cum_ln`, the
    * bitwise-comparable column); S(t) = exp(cum_ln) is one transcendental
    * on an identical pinned operand, rounded at 6 dp.
    */
  def kaplanMeier(durations: DataFrame, durationCol: Column, eventCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = durations.select(durationCol.cast("long").as("t"), eventCol.cast("long").as("e"))
    val byT = per.groupBy(col("t"))
      .agg(sum(col("e")).as("d"), sum(lit(1L) - col("e")).as("c"))
    val wSuffix = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrefix = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum(col("d") + col("c")).over(wSuffix))
      // d == n_risk (every remaining at-risk unit events here) sends the
      // curve to exactly 0 — handled as a sticky flag, not ln(0)
      .withColumn("ln_f",
        when(col("d") > 0 && col("d") < col("n_risk"),
          round(log(lit(1.0) - col("d").cast("double") / col("n_risk")), 9))
          .otherwise(lit(0.0)).cast("decimal(20,9)"))
      .withColumn("cum_ln", sum(col("ln_f")).over(wPrefix))
      .withColumn("hit_zero", max((col("d") === col("n_risk")).cast("int")).over(wPrefix))
      .select(col("t").as("duration"), col("d"), col("c"), col("n_risk"),
        col("cum_ln"),
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(round(exp(col("cum_ln").cast("double")), 6)).as("survival"))
      .orderBy("duration")
  }

  /** Pareto / ABC concentration over a keyed value aggregate: rank by
    * value desc, exact-decimal cumulative share, class A ≤ `aCut`,
    * B ≤ `bCut`, else C — thresholds compare on the ROUNDED share so both
    * engines classify identically.
    *
    * Scale shape (round-7; guide §2.5 — the key axis GROWS with the corpus,
    * so the previous unpartitioned rank/prefix window was a single-task
    * sort straggler at 10⁸ keys): range-bucket the aggregated values with a
    * monotone v→bucket map (equal v shares a bucket, so the global
    * (v desc, key) order is bucket order + within-bucket order), prefix-sum
    * the ≤`nBuckets` bucket histogram of (count, Σv) on the driver — the
    * [[CorpusShuffle]] bounded-axis pattern — and rank/cumsum within
    * buckets via a PARTITIONED window whose sort unit is |keys|/nBuckets.
    * Ranks and exact-decimal cumulative sums are identical to the global
    * window's by construction.
    */
  def paretoAbc(keyed: DataFrame, keyCol: Column, valueCents: Column,
      aCut: Double = 0.7, bCut: Double = 0.9, nBuckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = keyed.sparkSession
    import spark.implicits._
    // materialize the keyed aggregate ONCE (round-8; ADVICE r07): the
    // bounds pass, the bucket histogram, and the final ranked plan all read
    // it — uncached, the upstream aggregation executed three times (the
    // round-7 q_pareto_abc 0.2→4.9 s regression; accepted then as a
    // scale-safety trade, now simply removed)
    val agg = keyed.groupBy(keyCol.as("key"))
      .agg(sum(valueCents.cast("decimal(28,0)")).as("v"))
      .localCheckpoint(true)
    val bounds = agg.agg(min(col("v").cast("double")), max(col("v").cast("double"))).head()
    val (vMin, vMax) =
      if (bounds.isNullAt(0)) (0.0, 0.0) else (bounds.getDouble(0), bounds.getDouble(1))
    val width = math.max((vMax - vMin) / nBuckets, 1e-9)
    // descending buckets: v1 ≥ v2 ⇒ bucket(v1) ≤ bucket(v2); equal v ⇒ equal
    // bucket (decimal→double cast, subtraction, division by a positive
    // constant, floor, and clamping are all monotone)
    val bucketCol = least(greatest(
      floor((lit(vMax) - col("v").cast("double")) / lit(width)).cast("int"),
      lit(0)), lit(nBuckets - 1))
    val hist = agg.withColumn("__bucket", bucketCol)
      .groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"), sum(col("v")).as("__s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDecimal(2)))
      .sortBy(_._1)
    val totBd = hist.map(_._3.asInstanceOf[java.math.BigDecimal])
      .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
    val offsets = {
      var rankAcc = 0L
      var sumAcc = java.math.BigDecimal.ZERO
      hist.map { case (b, n, s) =>
        // __soff travels as a STRING (round-8; ADVICE r07): toDF on a
        // BigDecimal infers decimal(38,18), which caps cumulative sums near
        // 10^20 — the string→decimal(38,0) cast below is exact to 10^38
        val o = (b, rankAcc, sumAcc.toPlainString)
        rankAcc += n; sumAcc = sumAcc.add(s)
        o
      }
    }
    val offDf = offsets.toSeq.toDF("__bucket", "__roff", "__soff")
      .withColumn("__soff", col("__soff").cast("decimal(38,0)"))
    val wRank = Window.partitionBy(col("__bucket")).orderBy(col("v").desc, col("key"))
    val wCum = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg.withColumn("__bucket", bucketCol)
      .join(broadcast(offDf), Seq("__bucket"))
      .withColumn("rank", (col("__roff") + row_number().over(wRank)).cast("int"))
      .withColumn("cum_v", col("__soff") + sum(col("v")).over(wCum))
      .select(col("key"), col("v").cast("long").as("value_units"), col("rank"),
        round(col("cum_v").cast("double") /
          lit(scala.math.BigDecimal(totBd)).cast("decimal(38,0)").cast("double"),
          6).as("cum_share"))
      .withColumn("abc",
        when(col("cum_share") <= aCut, "A")
          .when(col("cum_share") <= bCut, "B").otherwise("C"))
      .orderBy("rank")
  }

  /** Gini coefficient of a value distribution (integer cents):
    * G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over ascending-sorted values.
    * Rank·value products are exact decimals (swap-invariant under ties),
    * two IEEE divisions at the end. The rank window runs above the
    * per-key aggregate.
    */
  def gini(keyed: DataFrame, keyCol: Column, valueCents: Column,
      nBuckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = keyed.sparkSession
    import spark.implicits._
    // one materialization for the bounds/histogram/rank passes (round-8;
    // ADVICE r07 — same fix as [[paretoAbc]])
    val agg = keyed.groupBy(keyCol.as("key"))
      .agg(sum(valueCents.cast("decimal(28,0)")).as("x"))
      .localCheckpoint(true)
    // ascending bucket-histogram ranks (round-7; guide §2.5): same
    // bounded-axis replacement for the unpartitioned rank window as
    // [[paretoAbc]] — the key axis grows with the corpus, so the global
    // `row_number` was a single-task sort. Equal x lands in one bucket, so
    // bucket-offset + within-bucket rank equals the global (x, key) rank.
    val bounds = agg.agg(min(col("x").cast("double")), max(col("x").cast("double"))).head()
    val (xMin, xMax) =
      if (bounds.isNullAt(0)) (0.0, 0.0) else (bounds.getDouble(0), bounds.getDouble(1))
    val width = math.max((xMax - xMin) / nBuckets, 1e-9)
    val bucketCol = least(greatest(
      floor((col("x").cast("double") - lit(xMin)) / lit(width)).cast("int"),
      lit(0)), lit(nBuckets - 1))
    val offsets = {
      val hist = agg.withColumn("__bucket", bucketCol)
        .groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      hist.map { case (b, n) => val o = (b, acc); acc += n; o }
    }
    val offDf = offsets.toSeq.toDF("__bucket", "__roff")
    val wRank = Window.partitionBy(col("__bucket")).orderBy(col("x"), col("key"))
    val ranked = agg.withColumn("__bucket", bucketCol)
      .join(broadcast(offDf), Seq("__bucket"))
      .withColumn("i",
        (col("__roff") + row_number().over(wRank)).cast("decimal(19,0)"))
    ranked.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("i") * col("x")).as("six"))
      .select(col("n"), col("sx").cast("long").as("total_cents"),
        round(
          (col("six") * lit(2)).cast("double") / (col("n") * col("sx")).cast("double")
            - (col("n") + lit(1)).cast("double") / col("n"), 6).as("gini"))
  }

  /** Two-proportion sample-size planning: units per arm to detect an
    * absolute lift `mde` over the observed base rate at the given z
    * quantiles (driver literals — no inverse-CDF in either engine):
    * n = (z_α·√(2p̄q̄) + z_β·√(p₁q₁ + p₂q₂))² / mde².
    */
  def abPower(assignments: DataFrame, convertedCol: Column, mde: Double,
      zAlpha: Double = 1.959964, zBeta: Double = 0.841621): DataFrame = {
    val base = assignments.agg(count(lit(1)).as("n"),
      sum(convertedCol.cast("long")).as("x"))
    val p1 = col("x").cast("double") / col("n")
    val p2 = p1 + lit(mde)
    val term = lit(zAlpha) * sqrt(lit(2.0) * p1 * (lit(1.0) - p1)) +
      lit(zBeta) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
    base.select(col("n").as("n_observed"), round(p1, 6).as("p_base"),
      lit(mde).as("mde"),
      ceil((term * term) / lit(mde * mde)).cast("long").as("n_per_arm"))
  }

  /** Herfindahl–Hirschman concentration index per market: HHI =
    * Σ (100·share_i)² over the supplier shares of each market's exact
    * integer revenue. Shares are single IEEE divisions on exact decimals;
    * the squared terms pin at 9 dp before the order-free decimal sum
    * (0–10000 scale; >2500 = highly concentrated, the DOJ convention).
    */
  def hhi(df: DataFrame, marketCol: Column, memberCol: Column,
      valueUnits: Column): DataFrame = {
    val byMember = df.groupBy(marketCol.as("market"), memberCol.as("member"))
      .agg(sum(valueUnits.cast("decimal(28,0)")).as("v"))
    val byMarket = byMember.groupBy(col("market"))
      .agg(sum(col("v")).as("tot"), count(lit(1)).as("n_members"))
    byMember.join(byMarket, Seq("market"))
      .select(col("market"), col("n_members"), col("tot"),
        round(
          (col("v").cast("double") / col("tot").cast("double") * lit(100.0)) *
            (col("v").cast("double") / col("tot").cast("double") * lit(100.0)), 9)
          .cast("decimal(24,9)").as("term"))
      .groupBy(col("market"), col("n_members"))
      .agg(round(sum(col("term")).cast("double"), 6).as("hhi"))
      .withColumn("concentrated", col("hhi") > 2500.0)
      .orderBy("market")
  }

  /** Odds ratio + relative risk with log-scale Wald CIs from the same
    * two-arm conversion frame as [[abTest]]. CI bounds stay in LN space —
    * exp() is the one libm call whose last ulp differs across engines,
    * and the consumer exponentiates when displaying.
    */
  def oddsRatio(assignments: DataFrame, armCol: Column, convertedCol: Column,
      zCrit: Double = 1.959964): DataFrame = {
    val agg = assignments.groupBy(armCol.as("arm"))
      .agg(count(lit(1)).as("n"), sum(convertedCol.cast("long")).as("x"))
    val a = agg.orderBy("arm").limit(2)
      .select(col("arm").as("arm_a"), col("n").as("n_a"), col("x").as("x_a")).limit(1)
    val b = agg.orderBy(col("arm").desc).limit(1)
      .select(col("arm").as("arm_b"), col("n").as("n_b"), col("x").as("x_b"))
    // cells: a=x_a, b=n_a-x_a, c=x_b, d=n_b-x_b
    val (ca, cb, cc, cd) = (col("x_a"), col("n_a") - col("x_a"),
      col("x_b"), col("n_b") - col("x_b"))
    val lnOr = log((ca.cast("double") * cd) / (cb.cast("double") * cc))
    val seLn = sqrt(lit(1.0) / ca + lit(1.0) / cb + lit(1.0) / cc + lit(1.0) / cd)
    val lnRr = log((ca.cast("double") / col("n_a")) / (cc.cast("double") / col("n_b")))
    a.crossJoin(b).select(
      col("arm_a"), col("x_a"), col("n_a"), col("arm_b"), col("x_b"), col("n_b"),
      round(lnOr, 6).as("ln_odds_ratio"),
      round(lnOr - lit(zCrit) * seLn, 6).as("ln_or_ci_lo"),
      round(lnOr + lit(zCrit) * seLn, 6).as("ln_or_ci_hi"),
      round(lnRr, 6).as("ln_relative_risk"),
      ((lnOr - lit(zCrit) * seLn) > 0.0 || (lnOr + lit(zCrit) * seLn) < 0.0)
        .as("significant"))
  }

  /** Benford first-digit diagnostic over positive integer amounts — the
    * classic fabricated-data / unit-mixing screen on financial columns.
    * First digits come from the integer's STRING head (both engines
    * render integers identically; `floor(log10)` sits on libm boundaries
    * at exact powers of ten). Expected frequencies log10(1+1/d) are
    * driver literals; per-digit χ² contributions from exact counts.
    */
  def benford(df: DataFrame, amountUnits: Column): DataFrame = {
    val expected = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
    val expCol = (1 to 9).foldLeft(lit(null).cast("double")) { (acc, d) =>
      when(col("digit") === d, lit(expected(d - 1)._2)).otherwise(acc)
    }
    val digits = df.where(amountUnits > 0)
      .select(substring(amountUnits.cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    digits.crossJoin(broadcast(digits.agg(sum(col("n")).as("tot"))))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("frac"),
        round(expCol, 6).as("expected_frac"),
        round(
          (col("n").cast("double") - col("tot") * expCol) *
            (col("n").cast("double") - col("tot") * expCol) / (col("tot") * expCol), 6)
          .as("chi2_term"))
      .orderBy("digit")
  }

  /** Pinned-weight EWMA over a bounded keyed series (daily counts):
    * s_t = Σ_{i≥2, i≤t} w_lag(t−i)·x_i + w_init(t−1)·x_1 with
    * w_lag(k) = α(1−α)^k and w_init(k) = (1−α)^k as EXACT-DECIMAL driver
    * literals pinned at `scale` digits — both engines consume the same
    * literal weight table, every product/sum is exact decimal, one IEEE
    * division never happens (pure polynomial). The self-join runs on the
    * bounded distinct-key axis (days), never data rows.
    */
  def ewmaWeights(alpha: BigDecimal, n: Int, scale: Int): (Seq[String], Seq[String]) = {
    val oneMinus = BigDecimal(1) - alpha
    val lag = (0 until n).map(k =>
      (alpha * oneMinus.pow(k)).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
        .underlying.toPlainString)
    val init = (0 until n).map(k =>
      oneMinus.pow(k).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
        .underlying.toPlainString)
    (lag, init)
  }

  def ewmaDaily(events: DataFrame, tsCol: Column, alpha: BigDecimal = BigDecimal("0.3"),
      maxDays: Int = 64, scale: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (lag, init) = ewmaWeights(alpha, maxDays, scale)
    val lagArr = array(lag.map(s => lit(BigDecimal(s)).cast(s"decimal(18,$scale)")): _*)
    val initArr = array(init.map(s => lit(BigDecimal(s)).cast(s"decimal(18,$scale)")): _*)
    val daily = events.groupBy(to_date(tsCol).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("rn", row_number().over(Window.orderBy(col("day"))))
      // the weight arrays hold maxDays entries: a day index past them would
      // silently drop old terms via element_at's out-of-bounds null (or
      // throw under ANSI) — fail loudly instead (round-7 ADVICE fix)
      .withColumn("rn", when(col("rn") <= maxDays, col("rn"))
        .otherwise(raise_error(concat(
          lit(s"ewmaDaily supports at most $maxDays distinct days; got day index "),
          col("rn").cast("string")))))
    val t = daily.select(col("day"), col("x").as("xt"), col("rn").as("rt"))
    val i = daily.select(col("x").as("xi"), col("rn").as("ri"))
    t.join(i, col("ri") <= col("rt"))
      .select(col("day"), col("xt"), col("rt"),
        (when(col("ri") === 1, element_at(initArr, col("rt")))
          .otherwise(element_at(lagArr, col("rt") - col("ri") + 1)) *
          col("xi").cast(s"decimal(18,0)")).as("w"))
      .groupBy(col("day"), col("xt"), col("rt"))
      .agg(sum(col("w")).as("s"))
      .select(col("day"), col("xt").as("n_events"),
        round(col("s").cast("double"), 6).as("ewma"),
        round(col("xt").cast("double") - col("s").cast("double"), 6).as("resid"))
      .orderBy("day")
  }

  /** First-order transition counts and conditional probabilities over
    * per-user event sequences. The lag window runs over the event axis —
    * the same capability surface as q_rel_user_window; ordering is made
    * total with the id tiebreak so replay is exact.
    */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val withPrev = events.select(col(userCol), col(tsCol), col(idCol),
      col(typeCol).as("to_type"), lag(col(typeCol), 1).over(w).as("from_type"))
    val counts = withPrev.filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val rowTot = counts.groupBy("from_type").agg(sum("n").as("n_from"))
    counts.join(broadcast(rowTot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        round(col("n").cast("double") / col("n_from"), 6).as("p"))
      .orderBy("from_type", "to_type")
  }
}
