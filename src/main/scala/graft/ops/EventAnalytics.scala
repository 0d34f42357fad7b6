package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event analytics — ordered funnels and cohort retention over
  * an append-only event stream. Beyond-reference: these are the two
  * queries every product/event warehouse runs on its largest table, and
  * at 100 TB they live or die on one property: NOTHING in the plan may
  * sort or window the raw event axis. Both operators here reduce events
  * to a per-user frame first (one shuffle on the user key) and run every
  * subsequent step on per-user/per-day aggregates, so cost is
  * O(|events|) scan + O(|users|)-scale joins regardless of history depth.
  *
  * Funnel semantics are the strict-order kind (Amplitude/Mixpanel
  * "ordered funnel"): step k counts a user iff some step-k event happens
  * STRICTLY AFTER the user's earliest completion time of step k-1. The
  * recurrence t_k(u) = min{ts : type = step_k, ts > t_{k-1}(u)} is a
  * per-user chained min — each step is one filtered aggregate joined to
  * the (shrinking) survivor frame on the user key, never a per-user
  * event sort. With k steps that is k passes over ever-smaller filtered
  * subsets; the filters push to the scan, and all joins share the user
  * hash key so AQE plans them shuffle-once per side.
  */
object EventAnalytics {

  /** Per-user completion times for an ordered funnel: one row per user
    * that completed the whole prefix, with `t1..tk` timestamps.
    * `events` needs (userCol, tsCol, typeCol).
    */
  def funnelTimes(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.zipWithIndex.tail.scanLeft(first) { case (prev, (step, i)) =>
      val k = i + 1
      // survivors of step k: earliest `step` event after t_{k-1}; the
      // previous times ride along via max() (constant per user)
      val carried = (1 until k).map(j => max(col(s"t$j")).as(s"t$j"))
      events.filter(col(typeCol) === step)
        .join(prev, Seq(userCol))
        .where(col(tsCol) > col(s"t$i"))
        .groupBy(col(userCol))
        .agg(carried.head, carried.tail :+ min(col(tsCol)).as(s"t$k"): _*)
    }
  }

  /** Funnel report: one row per step with survivor count, conversion vs
    * step 1, and mean hours from the previous step (micros summed exactly
    * as longs; ONE IEEE division chain at the end, mirrored by the
    * oracle). Step frames are tiny aggregates — the crossJoin is a
    * single-row broadcast.
    */
  def funnelReport(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      windowHours: Option[Int] = None): DataFrame = {
    val frames = windowHours match {
      case Some(h) => funnelTimesWindowed(events, userCol, tsCol, typeCol, steps, h)
      case None => funnelTimes(events, userCol, tsCol, typeCol, steps)
    }
    val perStep = frames.zipWithIndex.map { case (f, i) =>
      val k = i + 1
      val aggs =
        if (k == 1) Seq(count(lit(1)).as("n_users"), lit(null).cast("long").as("sum_us"))
        else Seq(count(lit(1)).as("n_users"),
          sum(unix_micros(col(s"t$k")) - unix_micros(col(s"t${k - 1}"))).as("sum_us"))
      f.agg(aggs.head, aggs.tail: _*)
        .select(lit(k).as("step"), lit(steps(i)).as("event_type"),
          col("n_users"), col("sum_us"))
    }
    assembleReport(perStep)
  }

  /** Funnel report from a WIDE per-user times frame (nullable t1..tk) —
    * the shape the streaming state table holds. Numerically identical to
    * [[funnelReport]]: same counts, same micros sums, same division chain.
    */
  def reportFromTimes(times: DataFrame, steps: Seq[String]): DataFrame = {
    val perStep = steps.zipWithIndex.map { case (step, i) =>
      val k = i + 1
      val aggs =
        if (k == 1) Seq(count(col("t1")).as("n_users"), lit(null).cast("long").as("sum_us"))
        else Seq(count(col(s"t$k")).as("n_users"),
          sum(when(col(s"t$k").isNotNull,
            unix_micros(col(s"t$k")) - unix_micros(col(s"t${k - 1}")))).as("sum_us"))
      times.agg(aggs.head, aggs.tail: _*)
        .select(lit(k).as("step"), lit(step).as("event_type"),
          col("n_users"), col("sum_us"))
    }
    assembleReport(perStep)
  }

  private def assembleReport(perStep: Seq[DataFrame]): DataFrame = {
    val firstN = perStep.head.select(col("n_users").as("__n1"))
    perStep.reduce(_.unionByName(_))
      .crossJoin(firstN)
      .select(col("step"), col("event_type"), col("n_users"),
        round(col("n_users").cast("double") / col("__n1"), 6).as("conv_from_first"),
        round((col("sum_us").cast("double") / col("n_users")) / lit(3600000000.0), 6)
          .as("avg_hours_from_prev"))
      .orderBy("step")
  }

  /** Cohort retention matrix: users are cohorted by the DAY of their first
    * event; a cohort is "retained" at day offset d when a user is active
    * (any event) exactly d days after their cohort day. Two aggregates on
    * the user key (first-day, distinct active-days) and one join — the
    * (user, day) frame is already distinct, so the cell count is a plain
    * `count(*)`, no countDistinct expansion. Cohort sizes are a bounded
    * (≤ #days) frame, broadcast for the retention ratio.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val firstDay = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val activeDays = events.select(col(userCol), to_date(col(tsCol)).as("d")).distinct()
    val sizes = firstDay.groupBy(col("cohort_day")).agg(count(lit(1)).as("n_cohort"))
    activeDays.join(firstDay, Seq(userCol))
      .groupBy(col("cohort_day"), datediff(col("d"), col("cohort_day")).as("offset_days"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("offset_days"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
      .orderBy("cohort_day", "offset_days")
  }

  /** Per-day active-user rollup: DAU plus sliding 7-day (WAU) and 30-day
    * (MAU) distinct actives and the DAU/MAU stickiness ratio. The sliding
    * windows are EXPLODED, not joined: each distinct (user, day) row fans
    * out to the ≤7/≤30 report days it contributes to, so the plan is one
    * distinct + linear explodes + counted aggregates — never a
    * day-range nested-loop join against the event axis. At 100 TB the
    * ×30 fan-out is the documented cost; the constant-space alternative is
    * the per-day HLL register table ([[graft.functions.DistinctSketch]])
    * merged over the window at read time.
    */
  def activeUsers(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ud = events.select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
    def windowed(days: Int, name: String): DataFrame = ud
      .select(col("u"), explode(sequence(lit(0), lit(days - 1))).as("off"), col("d"))
      .select(col("u"), date_add(col("d"), col("off")).as("day"))
      .groupBy("day").agg(countDistinct(col("u")).as(name))
    dau.join(windowed(7, "wau"), Seq("day"))
      .join(windowed(30, "mau"), Seq("day"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
      .orderBy("day")
  }

  /** Daily event-volume anomaly flags by the median/MAD rule — the robust
    * ops-monitoring screen (a mean/stddev z-score is itself dragged by the
    * outliers it should flag). Day counts reduce the event axis to a
    * bounded frame; median and MAD replay the exact-quantile rank rule
    * r = max(1, ceil(0.5·n)); everything stays INTEGER (counts, integer
    * medians, |dev| > k·MAD on longs) — no float appears anywhere, so
    * cross-engine equality is structural.
    */
  def dailyAnomalies(events: DataFrame, tsCol: String, k: Int = 3): DataFrame = {
    val daily = events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val med = Quantiles.exactQuantiles(
        daily.select(lit("ALL").as("g"), col("n_events").as("v")),
        col("g"), col("v"), Seq(0.5))
      .select(col("value").as("median_n"))
    val withMed = daily.crossJoin(broadcast(med))
      .withColumn("abs_dev", abs(col("n_events") - col("median_n")))
    val mad = Quantiles.exactQuantiles(
        withMed.select(lit("ALL").as("g"), col("abs_dev").as("v")),
        col("g"), col("v"), Seq(0.5))
      .select(col("value").as("mad"))
    withMed.crossJoin(broadcast(mad))
      .select(col("day"), col("n_events"), col("median_n"), col("abs_dev"), col("mad"),
        (col("abs_dev") > lit(k.toLong) * col("mad")).as("is_anomaly"))
      .orderBy("day")
  }

  /** RFM (recency / frequency / monetary) customer segmentation over
    * purchase events — the classic value-tiering rollup. Per user:
    * recency = days since last purchase (vs the corpus max day),
    * frequency = purchase count, monetary = exact-decimal value sum.
    * Each dimension scores 1–3 against its global tercile thresholds
    * (the exact-quantile rank rule; recency reversed — fresher is
    * better). One aggregate to the user axis; thresholds are a bounded
    * broadcast; the scoring scan is literal CASEs.
    */
  def rfmSegments(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      purchaseType: String,
      valueCol: String): DataFrame = {
    val p = events.filter(col(typeCol) === purchaseType)
    val maxDay = p.agg(max(to_date(col(tsCol))).as("max_day"))
    val per = p.groupBy(col(userCol).as("user_id"))
      .agg(max(to_date(col(tsCol))).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(round(col(valueCol), 2).cast("decimal(18,2)")).as("monetary"))
      .crossJoin(broadcast(maxDay))
      .select(col("user_id"),
        datediff(col("max_day"), col("last_day")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
    def thresholds(v: Column, name: String): DataFrame =
      Quantiles.exactQuantiles(
          per.select(lit("ALL").as("g"), v.as("v")), col("g"), col("v"),
          Seq(1.0 / 3.0, 2.0 / 3.0))
        .groupBy(col("grp"))
        .agg(min(col("value")).as(s"${name}_t1"), max(col("value")).as(s"${name}_t2"))
        .drop("grp")
    // monetary thresholds quantile over cents (long) so the rank machinery
    // stays integer; scores compare on the same cents axis
    val scored = per
      .withColumn("m_cents", (col("monetary") * 100).cast("long"))
      .crossJoin(broadcast(thresholds(col("recency_days"), "r")))
      .crossJoin(broadcast(thresholds(col("frequency"), "f")))
      .crossJoin(broadcast(thresholds((col("monetary") * 100).cast("long"), "m")))
    scored.select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary").cast("double").as("monetary"),
        (lit(3L) - (col("recency_days") > col("r_t1")).cast("long")
          - (col("recency_days") > col("r_t2")).cast("long")).as("r_score"),
        (lit(1L) + (col("frequency") > col("f_t1")).cast("long")
          + (col("frequency") > col("f_t2")).cast("long")).as("f_score"),
        (lit(1L) + (col("m_cents") > col("m_t1")).cast("long")
          + (col("m_cents") > col("m_t2")).cast("long")).as("m_score"))
      .withColumn("segment", concat_ws("-", col("r_score"), col("f_score"), col("m_score")))
      .orderBy("user_id")
  }

  /** Sliding-window funnel variant: like [[funnelReport]] but step k must
    * also land within `windowHours` of t1 (the "complete within N hours"
    * constraint every funnel product exposes). Same plan shape — the
    * window bound is one more pushed predicate on the step join.
    */
  def funnelTimesWindowed(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      windowHours: Int): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val bound = windowHours.toLong * 3600L * 1000000L
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.zipWithIndex.tail.scanLeft(first) { case (prev, (step, i)) =>
      val k = i + 1
      val carried = (1 until k).map(j => max(col(s"t$j")).as(s"t$j"))
      events.filter(col(typeCol) === step)
        .join(prev, Seq(userCol))
        .where(col(tsCol) > col(s"t$i") &&
          unix_micros(col(tsCol)) - unix_micros(col("t1")) <= bound)
        .groupBy(col(userCol))
        .agg(carried.head, carried.tail :+ min(col(tsCol)).as(s"t$k"): _*)
    }
  }
}
