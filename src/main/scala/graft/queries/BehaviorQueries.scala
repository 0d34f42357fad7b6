package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.metrics.Agreement
import graft.ml.BradleyTerry
import graft.ops.EventAnalytics
import graft.sources.Tables

/** Behavioral analytics + preference/labeling-QA gates — the session-5
  * additions to the beyond-reference surface:
  *
  *   - ordered funnel + windowed variant and cohort retention over the
  *     `events` stream table ([[graft.ops.EventAnalytics]]): the two
  *     canonical event-warehouse queries, planned with zero windows/sorts
  *     over the raw event axis;
  *   - Bradley–Terry preference-strength fit ([[graft.ml.BradleyTerry]]):
  *     the RLHF pairwise-preference batch model, MM-iterated with every
  *     round replayed by the oracle;
  *   - multi-rater agreement (Fleiss' κ + Krippendorff's α,
  *     [[graft.metrics.Agreement]]) over a 3-heuristic quality-rater
  *     panel on `documents`: the "do my filters agree beyond chance?"
  *     labeling-QA statistic.
  */
object BehaviorQueries extends QueryPack {

  private val FUNNEL_STEPS = Seq("signup", "click", "purchase")
  private val WINDOW_HOURS = 120
  private val BT_ITERS = 4

  // ---- the 3-heuristic rater panel over documents: length, type-token
  // ratio, average token length — each a row-local codegen'd vote
  private def raterVotes(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val lenSum = aggregate(t, lit(0L), (acc, x) => acc + length(x))
    docs.select(
      ((size(t) >= 20).cast("long") +
        (size(array_distinct(t)).cast("double") / size(t) >= 0.5).cast("long") +
        (lenSum.cast("double") / size(t) >= lit(4.0)).cast("long")).as("v"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> ((s, dir) =>
      EventAnalytics.funnelReport(Tables.cached(s, dir, "events"),
        "user_id", "ts", "event_type", FUNNEL_STEPS)),
    "q_funnel_windowed" -> ((s, dir) =>
      EventAnalytics.funnelReport(Tables.cached(s, dir, "events"),
        "user_id", "ts", "event_type", FUNNEL_STEPS, Some(WINDOW_HOURS))),
    "q_cohort_retention" -> ((s, dir) =>
      EventAnalytics.cohortRetention(Tables.cached(s, dir, "events"), "user_id", "ts")),
    "q_stream_funnel" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamFunnel(s, dir, FUNNEL_STEPS)),
    "q_stream_cohort" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamCohortRetention(s, dir)),
    "q_stream_transitions" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamEventTransitions(s, dir)),
    "q_active_users" -> ((s, dir) =>
      EventAnalytics.activeUsers(Tables.cached(s, dir, "events"), "user_id", "ts")),
    "q_event_anomaly" -> ((s, dir) =>
      EventAnalytics.dailyAnomalies(Tables.cached(s, dir, "events"), "ts")),
    "q_rfm_segments" -> ((s, dir) =>
      EventAnalytics.rfmSegments(Tables.cached(s, dir, "events"),
        "user_id", "ts", "event_type", "purchase", "value")),
    "q_ab_test" -> ((s, dir) => {
      // arms = user_id parity; conversion = any purchase of value >= 150
      // (every user makes SOME purchase on this fixture — the plain
      // "any purchase" conversion is degenerate with zero pooled variance)
      val conv = Tables.cached(s, dir, "events").groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase" && col("value") >= 150).cast("int")).as("cv"))
        .select((col("user_id") % 2).as("arm"), (col("cv") === 1).as("converted"))
      graft.ops.Experiments.abTest(conv, col("arm"), col("converted"))
    }),
    "q_basket_rules" -> ((s, dir) =>
      graft.ops.Experiments.basketRules(Tables.cached(s, dir, "lineitem"),
        col("l_orderkey"), col("l_partkey") % 50, minSupport = 5, topK = 25)),
    "q_event_transitions" -> ((s, dir) =>
      graft.ops.Experiments.eventTransitions(Tables.cached(s, dir, "events"),
        "user_id", "ts", "event_type", "event_id")),
    "q_survival_km" -> ((s, dir) => {
      // time signup→purchase with right censoring at the corpus max day
      val ev = Tables.cached(s, dir, "events")
      val frames = EventAnalytics.funnelTimes(ev, "user_id", "ts", "event_type",
        Seq("signup", "purchase"))
      val maxDay = ev.agg(max(to_date(col("ts"))).as("max_day"))
      val done = frames(1).select(
        datediff(to_date(col("t2")), to_date(col("t1"))).cast("long").as("dur"),
        lit(1L).as("e"))
      val cens = frames(0).join(frames(1).select("user_id"), Seq("user_id"), "left_anti")
        .crossJoin(broadcast(maxDay))
        .select(datediff(col("max_day"), to_date(col("t1"))).cast("long").as("dur"),
          lit(0L).as("e"))
      graft.ops.Experiments.kaplanMeier(done.unionByName(cens), col("dur"), col("e"))
        .withColumn("cum_ln", col("cum_ln").cast("double"))
    }),
    "q_pareto_abc" -> ((s, dir) => {
      // 2dp price × 2dp (1−disc) is EXACTLY 4 decimal digits — round at
      // 4 dp is an identity (the q_rel_order_revenue discipline); value
      // units are 1e-4 currency units, exact integers in both engines
      val units = (round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .cast("decimal(18,4)") * 10000).cast("decimal(28,0)")
      graft.ops.Experiments.paretoAbc(Tables.cached(s, dir, "lineitem"),
        col("l_partkey") % 50, units)
    }),
    "q_gini_revenue" -> ((s, dir) => {
      val cents = (round(col("o_totalprice"), 2).cast("decimal(18,2)") * 100)
        .cast("decimal(28,0)")
      graft.ops.Experiments.gini(Tables.cached(s, dir, "orders"), col("o_custkey"), cents)
    }),
    "q_hhi" -> ((s, dir) => {
      // supplier concentration of each nation-market's line revenue:
      // fact join + broadcast supplier dim, exact 1e-4 revenue units
      val li = Tables.cached(s, dir, "lineitem")
      val sup = broadcast(Tables.cached(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")))
      val joined = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      val units = (round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .cast("decimal(18,4)") * 10000).cast("decimal(28,0)")
      graft.ops.Experiments.hhi(joined, col("s_nationkey"), col("l_suppkey"), units)
    }),
    "q_odds_ratio" -> ((s, dir) => {
      val conv = Tables.cached(s, dir, "events").groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase" && col("value") >= 150).cast("int")).as("cv"))
        .select((col("user_id") % 2).as("arm"), (col("cv") === 1).as("converted"))
      graft.ops.Experiments.oddsRatio(conv, col("arm"), col("converted"))
    }),
    "q_ab_power" -> ((s, dir) => {
      val conv = Tables.cached(s, dir, "events").groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase" && col("value") >= 150).cast("int")).as("cv"))
        .select((col("cv") === 1).as("converted"))
      graft.ops.Experiments.abPower(conv, col("converted"), mde = 0.1)
    }),
    "q_rater_agreement" -> ((s, dir) =>
      Agreement.binaryAgreement(
        raterVotes(Tables.cached(s, dir, "documents")), col("v"), nRaters = 3)),
    "q_bradley_terry" -> ((s, dir) => {
      // comparisons: within each order, the supplier with the higher
      // (exact-decimal) line-revenue total beats the other; ties drop
      val rev = Tables.cached(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o"), col("l_suppkey").as("sk"))
        .agg(sum(round(col("l_extendedprice"), 2).cast("decimal(18,2)")).as("rev"))
      val a = rev.select(col("o"), col("sk").as("sa"), col("rev").as("ra"))
      val b = rev.select(col("o"), col("sk").as("sb"), col("rev").as("rb"))
      val comps = a.join(b, Seq("o"))
        .where(col("sa") < col("sb") && col("ra") =!= col("rb"))
        .select(
          when(col("ra") > col("rb"), col("sa")).otherwise(col("sb")).as("winner"),
          when(col("ra") > col("rb"), col("sb")).otherwise(col("sa")).as("loser"))
      BradleyTerry.fit(BradleyTerry.pairCounts(comps, "winner", "loser"), BT_ITERS)
        .select(col("player").as("s_suppkey"), col("wins"), col("n_comp"),
          col("strength").cast("double").as("strength"))
        .orderBy(col("strength").desc, col("s_suppkey"))
        .limit(25)
    }),
  )

  def oracleSql: Map[String, String] = {
    def funnelSql(windowPred: String): String =
      s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
         |            WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT e.user_id, max(s.t1) AS t1, min(e.ts) AS t2
         |       FROM events e JOIN s1 s ON s.user_id = e.user_id
         |       WHERE e.event_type = 'click' AND e.ts > s.t1 $windowPred GROUP BY 1),
         |s3 AS (SELECT e.user_id, max(s.t2) AS t2, min(e.ts) AS t3
         |       FROM events e JOIN s2 s ON s.user_id = e.user_id
         |       WHERE e.event_type = 'purchase' AND e.ts > s.t2 $windowPred GROUP BY 1),
         |n1 AS (SELECT count(*) AS n FROM s1),
         |p AS (SELECT 1 AS step, 'signup' AS event_type,
         |             (SELECT count(*) FROM s1) AS n_users, CAST(NULL AS BIGINT) AS sum_us
         |      UNION ALL
         |      SELECT 2, 'click', count(*),
         |             CAST(sum(epoch_us(t2) - epoch_us(t1)) AS BIGINT) FROM s2
         |      UNION ALL
         |      SELECT 3, 'purchase', count(*),
         |             CAST(sum(epoch_us(t3) - epoch_us(t2)) AS BIGINT) FROM s3)
         |SELECT CAST(step AS INT) AS step, event_type,
         |  CAST(n_users AS BIGINT) AS n_users,
         |  round(CAST(n_users AS DOUBLE) / n1.n, 6) AS conv_from_first,
         |  round((CAST(sum_us AS DOUBLE) / n_users) / 3600000000.0, 6) AS avg_hours_from_prev
         |FROM p CROSS JOIN n1 ORDER BY step
         |""".stripMargin
    val windowPred =
      s"AND epoch_us(e.ts) - epoch_us(s.t1) <= ${WINDOW_HOURS.toLong * 3600L * 1000000L}"
    val transitionsSql =
      s"""WITH t AS (SELECT event_type AS to_type,
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
         |  FROM events),
         |c AS (SELECT from_type, to_type, count(*) AS n FROM t
         |  WHERE from_type IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT from_type, sum(n) AS n_from FROM c GROUP BY 1)
         |SELECT c.from_type, c.to_type, CAST(n AS BIGINT) AS n,
         |  CAST(n_from AS BIGINT) AS n_from,
         |  round(CAST(n AS DOUBLE) / n_from, 6) AS p
         |FROM c JOIN rt USING (from_type) ORDER BY 1, 2
         |""".stripMargin
    val cohortSql =
      s"""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
         |           FROM events GROUP BY 1),
         |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |c AS (SELECT f.cohort_day, datediff('day', f.cohort_day, a.d) AS offset_days,
         |             count(*) AS n_active
         |      FROM a JOIN f USING (user_id) GROUP BY 1, 2),
         |s AS (SELECT cohort_day, count(*) AS n_cohort FROM f GROUP BY 1)
         |SELECT c.cohort_day, CAST(c.offset_days AS INT) AS offset_days,
         |  CAST(c.n_active AS BIGINT) AS n_active,
         |  CAST(s.n_cohort AS BIGINT) AS n_cohort,
         |  round(CAST(c.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
         |FROM c JOIN s USING (cohort_day) ORDER BY 1, 2
         |""".stripMargin
    Map(
      "q_funnel" -> funnelSql(""),
      // streamed per-user state machine over time-ordered ingest ≡ the
      // one-shot batch funnel (a set step time is final; unset suffixes
      // extend per batch) — the batch oracle verbatim
      "q_stream_funnel" -> funnelSql(""),
      // the windowed variant carries t1 through s2 so the bound applies to
      // both the second and third hops, mirroring funnelTimesWindowed
      "q_funnel_windowed" ->
        s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
           |            WHERE event_type = 'signup' GROUP BY 1),
           |s2 AS (SELECT e.user_id, max(s.t1) AS t1, min(e.ts) AS t2
           |       FROM events e JOIN s1 s ON s.user_id = e.user_id
           |       WHERE e.event_type = 'click' AND e.ts > s.t1 $windowPred GROUP BY 1),
           |s3 AS (SELECT e.user_id, max(s.t2) AS t2, min(e.ts) AS t3
           |       FROM events e JOIN s2 s ON s.user_id = e.user_id
           |       WHERE e.event_type = 'purchase' AND e.ts > s.t2 $windowPred GROUP BY 1),
           |n1 AS (SELECT count(*) AS n FROM s1),
           |p AS (SELECT 1 AS step, 'signup' AS event_type,
           |             (SELECT count(*) FROM s1) AS n_users, CAST(NULL AS BIGINT) AS sum_us
           |      UNION ALL
           |      SELECT 2, 'click', count(*),
           |             CAST(sum(epoch_us(t2) - epoch_us(t1)) AS BIGINT) FROM s2
           |      UNION ALL
           |      SELECT 3, 'purchase', count(*),
           |             CAST(sum(epoch_us(t3) - epoch_us(t2)) AS BIGINT) FROM s3)
           |SELECT CAST(step AS INT) AS step, event_type,
           |  CAST(n_users AS BIGINT) AS n_users,
           |  round(CAST(n_users AS DOUBLE) / n1.n, 6) AS conv_from_first,
           |  round((CAST(sum_us AS DOUBLE) / n_users) / 3600000000.0, 6) AS avg_hours_from_prev
           |FROM p CROSS JOIN n1 ORDER BY step
           |""".stripMargin,
      // pooled two-proportion z; every ratio a single IEEE op on integer
      // operands, sqrt correctly rounded per IEEE — no pinning needed
      "q_ab_test" ->
        s"""WITH conv AS (SELECT user_id,
           |    max(CASE WHEN event_type = 'purchase' AND value >= 150 THEN 1 ELSE 0 END) AS cv
           |  FROM events GROUP BY 1),
           |agg AS (SELECT user_id % 2 AS arm, count(*) AS n, sum(cv) AS x
           |  FROM conv GROUP BY 1),
           |p AS (SELECT
           |    CAST(0 AS BIGINT) AS arm_a,
           |    CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
           |    CAST(sum(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS x_a,
           |    CAST(1 AS BIGINT) AS arm_b,
           |    CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
           |    CAST(sum(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS x_b
           |  FROM agg),
           |s AS (SELECT *, CAST(x_a AS DOUBLE) / n_a AS pa, CAST(x_b AS DOUBLE) / n_b AS pb,
           |    CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS pool FROM p),
           |z AS (SELECT *, sqrt((pool * (CAST(1.0 AS DOUBLE) - pool)) *
           |    (CAST(1.0 AS DOUBLE) / n_a + CAST(1.0 AS DOUBLE) / n_b)) AS se FROM s)
           |SELECT arm_a, n_a, x_a, round(pa, 6) AS p_a,
           |  arm_b, n_b, x_b, round(pb, 6) AS p_b,
           |  round(pa - pb, 6) AS diff,
           |  round((pa - pb) / se, 6) AS z,
           |  abs((pa - pb) / se) > 1.959964 AS significant
           |FROM z
           |""".stripMargin,
      // within-basket self-join (cost bounded by basket size squared),
      // decimal cross-products for lift
      "q_basket_rules" ->
        s"""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey % 50 AS i FROM lineitem),
           |nb AS (SELECT count(DISTINCT b) AS n_baskets FROM bi),
           |itn AS (SELECT i, count(*) AS n_i FROM bi GROUP BY 1),
           |pr AS (SELECT l.i AS item_a, r.i AS item_b, count(*) AS n_ab
           |  FROM bi l JOIN bi r ON l.b = r.b AND l.i < r.i
           |  GROUP BY 1, 2 HAVING count(*) >= 5),
           |sc AS (SELECT item_a, item_b, n_ab, na.n_i AS n_a, nbb.n_i AS n_b, nb.n_baskets
           |  FROM pr JOIN itn na ON na.i = pr.item_a
           |  JOIN itn nbb ON nbb.i = pr.item_b CROSS JOIN nb)
           |SELECT CAST(item_a AS BIGINT) AS item_a, CAST(item_b AS BIGINT) AS item_b,
           |  CAST(n_ab AS BIGINT) AS n_ab, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           |  round(CAST(n_ab AS DOUBLE) / n_baskets, 6) AS support,
           |  round(CAST(n_ab AS DOUBLE) / n_a, 6) AS conf_a_to_b,
           |  round(CAST(n_ab AS DOUBLE) / n_b, 6) AS conf_b_to_a,
           |  round(CAST(CAST(n_ab AS DECIMAL(19,0)) * CAST(n_baskets AS DECIMAL(19,0)) AS DOUBLE)
           |    / CAST(CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)) AS DOUBLE), 6) AS lift
           |FROM sc ORDER BY lift DESC, item_a, item_b LIMIT 25
           |""".stripMargin,
      // KM replay: suffix-sum risk sets, 9-dp-pinned log factors, exact
      // decimal cumulative, ONE exp on the identical pinned operand
      "q_survival_km" ->
        s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
           |  WHERE event_type = 'signup' GROUP BY 1),
           |s2 AS (SELECT e.user_id, max(s.t1) AS t1, min(e.ts) AS t2
           |  FROM events e JOIN s1 s ON s.user_id = e.user_id
           |  WHERE e.event_type = 'purchase' AND e.ts > s.t1 GROUP BY 1),
           |mx AS (SELECT max(CAST(ts AS DATE)) AS md FROM events),
           |dur AS (SELECT datediff('day', CAST(t1 AS DATE), CAST(t2 AS DATE)) AS t, 1 AS e
           |    FROM s2
           |  UNION ALL
           |  SELECT datediff('day', CAST(s1.t1 AS DATE), mx.md), 0
           |    FROM s1 CROSS JOIN mx
           |    WHERE s1.user_id NOT IN (SELECT user_id FROM s2)),
           |byt AS (SELECT t, sum(e) AS d, sum(1 - e) AS c FROM dur GROUP BY 1),
           |nr AS (SELECT t, d, c,
           |    sum(d + c) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n_risk
           |  FROM byt),
           |lf AS (SELECT *, CAST(CASE WHEN d > 0 AND d < n_risk
           |    THEN round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9) ELSE 0.0 END
           |    AS DECIMAL(20,9)) AS ln_f FROM nr),
           |cl AS (SELECT *,
           |    sum(ln_f) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum_ln,
           |    max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
           |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS hit_zero
           |  FROM lf)
           |SELECT CAST(t AS BIGINT) AS duration, CAST(d AS BIGINT) AS d,
           |  CAST(c AS BIGINT) AS c, CAST(n_risk AS BIGINT) AS n_risk,
           |  CAST(cum_ln AS DOUBLE) AS cum_ln,
           |  CASE WHEN hit_zero = 1 THEN 0.0
           |       ELSE round(exp(CAST(cum_ln AS DOUBLE)), 6) END AS survival
           |FROM cl ORDER BY duration
           |""".stripMargin,
      // exact-decimal cumulative shares ranked desc; ABC classes compare
      // on the ROUNDED share
      "q_pareto_abc" ->
        s"""WITH v AS (SELECT l_partkey % 50 AS key,
           |    sum(CAST(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))
           |        * 10000 AS DECIMAL(28,0))) AS v
           |  FROM lineitem GROUP BY 1),
           |tot AS (SELECT sum(v) AS tot FROM v),
           |r AS (SELECT key, v,
           |    row_number() OVER (ORDER BY v DESC, key) AS rank,
           |    sum(v) OVER (ORDER BY v DESC, key ROWS UNBOUNDED PRECEDING) AS cum_v
           |  FROM v),
           |sh AS (SELECT key, CAST(v AS BIGINT) AS value_units, CAST(rank AS INT) AS rank,
           |    round(CAST(cum_v AS DOUBLE) / CAST(tot.tot AS DOUBLE), 6) AS cum_share
           |  FROM r CROSS JOIN tot)
           |SELECT CAST(key AS BIGINT) AS key, value_units, rank, cum_share,
           |  CASE WHEN cum_share <= 0.7 THEN 'A'
           |       WHEN cum_share <= 0.9 THEN 'B' ELSE 'C' END AS abc
           |FROM sh ORDER BY rank
           |""".stripMargin,
      // 2*sum(i*x)/(n*sum(x)) - (n+1)/n over ascending order; decimal
      // rank-value products, two IEEE divisions
      "q_gini_revenue" ->
        s"""WITH x AS (SELECT o_custkey AS key,
           |    sum(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100
           |        AS DECIMAL(28,0))) AS x
           |  FROM orders GROUP BY 1),
           |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, key) AS DECIMAL(19,0)) AS i
           |  FROM x),
           |a AS (SELECT count(*) AS n, sum(x) AS sx, sum(i * x) AS six FROM r)
           |SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS total_cents,
           |  round(CAST(six * 2 AS DOUBLE) / CAST(n * sx AS DOUBLE)
           |        - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
           |FROM a
           |""".stripMargin,
      // shares one IEEE division each on exact decimals, squared terms
      // pinned at 9 dp before the order-free sum
      "q_hhi" ->
        s"""WITH bm AS (SELECT s_nationkey AS market, l_suppkey AS member,
           |    sum(CAST(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))
           |        * 10000 AS DECIMAL(28,0))) AS v
           |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |  GROUP BY 1, 2),
           |mk AS (SELECT market, sum(v) AS tot, count(*) AS n_members FROM bm GROUP BY 1),
           |t AS (SELECT bm.market, mk.n_members,
           |    CAST(round((CAST(v AS DOUBLE) / CAST(tot AS DOUBLE) * 100.0)
           |         * (CAST(v AS DOUBLE) / CAST(tot AS DOUBLE) * 100.0), 9)
           |      AS DECIMAL(24,9)) AS term
           |  FROM bm JOIN mk USING (market))
           |SELECT CAST(market AS BIGINT) AS market, CAST(n_members AS BIGINT) AS n_members,
           |  round(CAST(sum(term) AS DOUBLE), 6) AS hhi,
           |  round(CAST(sum(term) AS DOUBLE), 6) > 2500.0 AS concentrated
           |FROM t GROUP BY 1, 2 ORDER BY 1
           |""".stripMargin,
      // log-scale Wald CIs — no exp() in either plan (the one libm call
      // whose last ulp differs across engines)
      "q_odds_ratio" ->
        s"""WITH conv AS (SELECT user_id,
           |    max(CASE WHEN event_type = 'purchase' AND value >= 150 THEN 1 ELSE 0 END) AS cv
           |  FROM events GROUP BY 1),
           |agg AS (SELECT user_id % 2 AS arm, count(*) AS n, sum(cv) AS x
           |  FROM conv GROUP BY 1),
           |p AS (SELECT
           |    CAST(0 AS BIGINT) AS arm_a,
           |    CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
           |    CAST(sum(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS x_a,
           |    CAST(1 AS BIGINT) AS arm_b,
           |    CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
           |    CAST(sum(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS x_b
           |  FROM agg),
           |c AS (SELECT *, n_a - x_a AS cb, n_b - x_b AS cd FROM p),
           |s AS (SELECT *,
           |    ln((CAST(x_a AS DOUBLE) * cd) / (CAST(cb AS DOUBLE) * x_b)) AS ln_or,
           |    sqrt(CAST(1.0 AS DOUBLE) / x_a + CAST(1.0 AS DOUBLE) / cb
           |         + CAST(1.0 AS DOUBLE) / x_b + CAST(1.0 AS DOUBLE) / cd) AS se,
           |    ln((CAST(x_a AS DOUBLE) / n_a) / (CAST(x_b AS DOUBLE) / n_b)) AS ln_rr
           |  FROM c)
           |SELECT arm_a, x_a, n_a, arm_b, x_b, n_b,
           |  round(ln_or, 6) AS ln_odds_ratio,
           |  round(ln_or - 1.959964 * se, 6) AS ln_or_ci_lo,
           |  round(ln_or + 1.959964 * se, 6) AS ln_or_ci_hi,
           |  round(ln_rr, 6) AS ln_relative_risk,
           |  (ln_or - 1.959964 * se) > 0.0 OR (ln_or + 1.959964 * se) < 0.0 AS significant
           |FROM s
           |""".stripMargin,
      // closed-form n per arm from the observed base rate; z quantiles are
      // driver literals, sqrt correctly rounded per IEEE
      "q_ab_power" ->
        s"""WITH conv AS (SELECT user_id,
           |    max(CASE WHEN event_type = 'purchase' AND value >= 150 THEN 1 ELSE 0 END) AS cv
           |  FROM events GROUP BY 1),
           |b AS (SELECT count(*) AS n, sum(cv) AS x FROM conv),
           |s AS (SELECT n, CAST(x AS DOUBLE) / n AS p1,
           |    CAST(x AS DOUBLE) / n + 0.1 AS p2 FROM b),
           |t AS (SELECT n, p1,
           |    1.959964 * sqrt(CAST(2.0 AS DOUBLE) * p1 * (CAST(1.0 AS DOUBLE) - p1))
           |    + 0.841621 * sqrt(p1 * (CAST(1.0 AS DOUBLE) - p1)
           |                      + p2 * (CAST(1.0 AS DOUBLE) - p2)) AS term
           |  FROM s)
           |SELECT CAST(n AS BIGINT) AS n_observed, round(p1, 6) AS p_base,
           |  CAST(0.1 AS DOUBLE) AS mde,
           |  CAST(ceil((term * term)
           |    / (CAST(0.1 AS DOUBLE) * CAST(0.1 AS DOUBLE))) AS BIGINT) AS n_per_arm
           |FROM t
           |""".stripMargin,
      // per-user lag with a total (ts, id) order; conditional probabilities
      // over the bounded type-pair axis
      "q_event_transitions" -> transitionsSql,
      // within-batch lag pairs + one carried boundary pair per user over
      // time-ordered ingest ≡ one-shot batch — the batch oracle verbatim
      "q_stream_transitions" -> transitionsSql,
      // exploded sliding windows, distinct counted per report day
      "q_active_users" ->
        s"""WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
           |dau AS (SELECT d AS day, count(*) AS dau FROM ud GROUP BY 1),
           |wau AS (SELECT day, count(DISTINCT u) AS wau FROM (
           |    SELECT u, d + CAST(x AS INT) AS day
           |    FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS x) o) z GROUP BY 1),
           |mau AS (SELECT day, count(DISTINCT u) AS mau FROM (
           |    SELECT u, d + CAST(x AS INT) AS day
           |    FROM ud CROSS JOIN (SELECT unnest(range(0, 30)) AS x) o) z GROUP BY 1)
           |SELECT dau.day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
           |  CAST(mau AS BIGINT) AS mau,
           |  round(CAST(dau AS DOUBLE) / mau, 6) AS stickiness
           |FROM dau JOIN wau USING (day) JOIN mau USING (day) ORDER BY 1
           |""".stripMargin,
      // median/MAD rank-rule replay; fully integer — no float anywhere
      "q_event_anomaly" -> {
        val half = 0.5
        s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
           |  FROM events GROUP BY 1),
           |nn AS (SELECT count(*) AS n FROM daily),
           |r1 AS (SELECT n_events AS v, row_number() OVER (ORDER BY n_events) AS rn FROM daily),
           |med AS (SELECT v AS median_n FROM r1 CROSS JOIN nn
           |  WHERE rn = greatest(1, CAST(ceil(CAST($half AS DOUBLE) * n) AS BIGINT))),
           |wd AS (SELECT day, n_events, median_n,
           |    abs(n_events - median_n) AS abs_dev FROM daily CROSS JOIN med),
           |r2 AS (SELECT abs_dev AS v, row_number() OVER (ORDER BY abs_dev) AS rn FROM wd),
           |madt AS (SELECT v AS mad FROM r2 CROSS JOIN nn
           |  WHERE rn = greatest(1, CAST(ceil(CAST($half AS DOUBLE) * n) AS BIGINT)))
           |SELECT day, CAST(n_events AS BIGINT) AS n_events,
           |  CAST(median_n AS BIGINT) AS median_n, CAST(abs_dev AS BIGINT) AS abs_dev,
           |  CAST(mad AS BIGINT) AS mad, abs_dev > 3 * mad AS is_anomaly
           |FROM wd CROSS JOIN madt ORDER BY day
           |""".stripMargin
      },
      // per-dimension tercile thresholds via the exact-quantile rank rule,
      // then literal-CASE scoring (recency reversed); monetary exact
      // decimals, compared on the cents axis
      "q_rfm_segments" -> {
        val q1 = 1.0 / 3.0
        val q2 = 2.0 / 3.0
        def thr(expr: String, name: String) =
          s"""r_$name AS (SELECT $expr AS v, row_number() OVER (ORDER BY $expr) AS rn FROM per),
             |t_$name AS (SELECT
             |  (SELECT v FROM r_$name CROSS JOIN nn
             |   WHERE rn = greatest(1, CAST(ceil(CAST($q1 AS DOUBLE) * n) AS BIGINT))) AS t1,
             |  (SELECT v FROM r_$name CROSS JOIN nn
             |   WHERE rn = greatest(1, CAST(ceil(CAST($q2 AS DOUBLE) * n) AS BIGINT))) AS t2)""".stripMargin
        s"""WITH p AS (SELECT user_id, CAST(ts AS DATE) AS d,
           |    CAST(round(value, 2) AS DECIMAL(18,2)) AS v
           |  FROM events WHERE event_type = 'purchase'),
           |mx AS (SELECT max(d) AS max_day FROM p),
           |per AS (SELECT user_id,
           |    CAST(datediff('day', max(d), max(max_day)) AS BIGINT) AS recency_days,
           |    count(*) AS frequency, sum(v) AS monetary
           |  FROM p CROSS JOIN mx GROUP BY user_id),
           |nn AS (SELECT count(*) AS n FROM per),
           |${thr("recency_days", "r")},
           |${thr("frequency", "f")},
           |${thr("CAST(monetary * 100 AS BIGINT)", "m")},
           |scored AS (SELECT user_id, recency_days, CAST(frequency AS BIGINT) AS frequency,
           |    CAST(monetary AS DOUBLE) AS monetary,
           |    3 - CAST(recency_days > t_r.t1 AS BIGINT)
           |      - CAST(recency_days > t_r.t2 AS BIGINT) AS r_score,
           |    1 + CAST(frequency > t_f.t1 AS BIGINT)
           |      + CAST(frequency > t_f.t2 AS BIGINT) AS f_score,
           |    1 + CAST(CAST(monetary * 100 AS BIGINT) > t_m.t1 AS BIGINT)
           |      + CAST(CAST(monetary * 100 AS BIGINT) > t_m.t2 AS BIGINT) AS m_score
           |  FROM per CROSS JOIN t_r CROSS JOIN t_f CROSS JOIN t_m)
           |SELECT user_id, recency_days, frequency, monetary,
           |  r_score, f_score, m_score,
           |  concat_ws('-', r_score, f_score, m_score) AS segment
           |FROM scored ORDER BY user_id
           |""".stripMargin
      },
      "q_cohort_retention" -> cohortSql,
      // per-batch (min first-day, distinct active-day) partials merged at
      // close ≡ one-shot batch (both inputs decomposable) — the batch
      // oracle verbatim
      "q_stream_cohort" -> cohortSql,
      // integer corpus sums (N, S1, SA, SV01) then the κ/α scalar chain in
      // the exact operation order of Agreement.binaryAgreement
      "q_rater_agreement" ->
        s"""WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
           |v AS (SELECT
           |    CAST(len(t) >= 20 AS BIGINT)
           |    + CAST(CAST(len(list_distinct(t)) AS DOUBLE) / len(t) >= 0.5 AS BIGINT)
           |    + CAST(CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE)
           |           / len(t) >= 4.0 AS BIGINT) AS v
           |  FROM t),
           |a AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
           |             CAST(sum(v) AS BIGINT) AS s1,
           |             CAST(sum(v * v + (3 - v) * (3 - v)) AS BIGINT) AS sa,
           |             CAST(sum(v * (3 - v)) AS BIGINT) AS sv01
           |      FROM v),
           |sc AS (SELECT n_items, s1, sa, sv01,
           |         CAST(sa - n_items * 3 AS DOUBLE) / (n_items * 3 * 2) AS p_bar,
           |         CAST(s1 AS DOUBLE) / (n_items * 3) AS p1,
           |         CAST(sv01 * 2 AS DOUBLE) / (2 * n_items * 3) AS d_o,
           |         CAST(2 * (n_items * 3 - s1) * s1 AS DOUBLE)
           |           / (n_items * 3 * (n_items * 3 - 1)) AS d_e
           |       FROM a)
           |SELECT n_items, 3 AS n_raters,
           |  round(p_bar, 6) AS p_bar,
           |  round(p1 * p1 + (1.0 - p1) * (1.0 - p1), 6) AS p_e,
           |  round((p_bar - (p1 * p1 + (1.0 - p1) * (1.0 - p1)))
           |        / (1.0 - (p1 * p1 + (1.0 - p1) * (1.0 - p1))), 6) AS kappa,
           |  round(d_o, 6) AS d_o,
           |  round(d_e, 6) AS d_e,
           |  round(1.0 - d_o / d_e, 6) AS alpha
           |FROM sc
           |""".stripMargin,
      "q_bradley_terry" -> {
        val pairsCte =
          """SELECT least(winner, loser) AS lo, greatest(winner, loser) AS hi,
            |    CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CASE WHEN winner < loser THEN 1 ELSE 0 END) AS BIGINT) AS w_lo
            |  FROM cmp GROUP BY 1, 2""".stripMargin
        s"""WITH rev AS (SELECT l_orderkey AS o, l_suppkey AS sk,
           |    sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2))) AS rev
           |  FROM lineitem GROUP BY 1, 2),
           |cmp AS (SELECT
           |    CASE WHEN a.rev > b.rev THEN a.sk ELSE b.sk END AS winner,
           |    CASE WHEN a.rev > b.rev THEN b.sk ELSE a.sk END AS loser
           |  FROM rev a JOIN rev b ON a.o = b.o AND a.sk < b.sk AND a.rev <> b.rev),
           |${BradleyTerry.oracleCtes(pairsCte, BT_ITERS)}
           |SELECT player AS s_suppkey, wins, n_comp,
           |  CAST(strength AS DOUBLE) AS strength
           |FROM bt_final ORDER BY strength DESC, s_suppkey LIMIT 25
           |""".stripMargin
      },
    )
  }
}
