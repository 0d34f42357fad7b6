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
    * `armCol` (two distinct values, compared in ascending order) and a
    * boolean `convertedCol`. Returns one row: per-arm n/x/rate, absolute
    * difference, pooled z, and significance at the given |z| threshold.
    */
  def abTest(assignments: DataFrame, armCol: Column, convertedCol: Column,
      zCrit: Double = 1.959964): DataFrame = {
    val agg = assignments.groupBy(armCol.as("arm"))
      .agg(count(lit(1)).as("n"), sum(convertedCol.cast("long")).as("x"))
    val arms = agg.orderBy("arm").limit(2)
    val a = arms.select(col("arm").as("arm_a"), col("n").as("n_a"), col("x").as("x_a")).limit(1)
    val b = arms.orderBy(col("arm").desc).limit(1)
      .select(col("arm").as("arm_b"), col("n").as("n_b"), col("x").as("x_b"))
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
