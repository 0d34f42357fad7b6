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
