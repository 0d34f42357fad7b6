package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** General relational capability over the TPC-H-ish tables — scan/filter/
  * aggregate/join/window surface (SURVEY §2.2-2.6 Spark primitives) and the
  * bench headliners on the largest table (`lineitem`, ~600k rows at sf0.1).
  *
  * Plans are deliberately pushdown-friendly: filters and projections reach
  * the parquet scan; the dimension side of every join broadcasts.
  */
object RelationalQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: single scan + hash aggregate
    "q_rel_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    // order-revenue join: fact-fact equi-join, dimension broadcast
    "q_rel_order_revenue" -> ((s, dir) => {
      // money semantics, scale-proof: round each line's revenue to 4 dp,
      // sum EXACT decimals (order-independent — double SUM drifted past
      // the 4-dp pin at the sf1 probe's 2×10¹⁰ magnitudes), cast back
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .cast("decimal(28,4)")).cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),
    // per-month top-3 revenue days: window rank over a time-bucketed agg
    "q_rel_top_revenue_days" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val daily = li
        .groupBy(to_date(date_trunc("month", col("l_shipdate"))).as("month"),
          to_date(col("l_shipdate")).as("day"))
        .agg(round(sum(col("l_extendedprice")), 4).as("day_rev"))
      val w = Window.partitionBy("month").orderBy(col("day_rev").desc, col("day"))
      daily.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
    }),
    // per-user event analytics: lag/lead/running-sum/ntile window functions
    "q_rel_user_window" -> ((s, dir) => {
      val ev = graft.sources.Tables.cached(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy("ts")
      ev.select(
        col("event_id"), col("user_id"),
        round(lag(col("value"), 1).over(w), 6).as("prev_value"),
        round(lead(col("value"), 1).over(w), 6).as("next_value"),
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 6).as("running_value"),
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("quartile"))
    }),
    // as-of join: each purchase picks up the latest prior-or-equal click by
    // the same user — point-in-time feature attachment with no row-
    // multiplying join (single key-shuffle + running window, ops/AsOfJoin)
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.cached(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          rightPrefix = "click_")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          round(col("value"), 6).as("purchase_value"),
          unix_micros(col("click_ts")).as("click_ts_us"),
          round(col("click_value"), 6).as("click_value"))
    }),
    // nation-level customer order stats: two broadcast joins up a snowflake
    "q_rel_nation_orders" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val nat = broadcast(Tables.nation(s, dir))
      val ord = Tables.orders(s, dir)
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(nat, cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("total_price"))
    }),
    // TPC-H Q8-flavor market share: supplier-nation revenue share within
    // each order year. One fact-fact join (lineitem↔orders), dimensions
    // broadcast; the year totals derive from the nation-level aggregate
    // (bounded: years × nations), never a second fact pass
    "q_rel_market_share" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir).select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val sup = broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")))
      val nat = broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name")))
      val byNation = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(nat, sup("s_nationkey") === nat("n_nationkey"))
        .groupBy(col("o_year"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .cast("decimal(28,4)")).as("rev"))
      val yearTot = byNation.groupBy(col("o_year")).agg(sum(col("rev")).as("year_rev"))
      byNation.join(broadcast(yearTot), Seq("o_year"))
        .select(col("o_year"), col("n_name"),
          col("rev").cast("double").as("revenue"),
          round(col("rev").cast("double") / col("year_rev").cast("double"), 6).as("share"))
        .orderBy("o_year", "n_name")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |""".stripMargin,
    "q_rel_order_revenue" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority
        |""".stripMargin,
    "q_rel_top_revenue_days" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |         CAST(l_shipdate AS DATE) AS day,
        |         round(sum(l_extendedprice), 4) AS day_rev
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT month, day, day_rev,
        |       CAST(row_number() OVER (PARTITION BY month ORDER BY day_rev DESC, day) AS INT) AS rnk
        |FROM daily QUALIFY rnk <= 3
        |""".stripMargin,
    "q_rel_user_window" ->
      """SELECT event_id, user_id,
        |  round(lag(value, 1) OVER w, 6) AS prev_value,
        |  round(lead(value, 1) OVER w, 6) AS next_value,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING), 6) AS running_value,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |""".stripMargin,
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  round(p.value, 6) AS purchase_value,
        |  epoch_us(c.ts) AS click_ts_us,
        |  round(c.value, 6) AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |""".stripMargin,
    "q_rel_nation_orders" ->
      """SELECT n_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 4) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |""".stripMargin,
    // 4-dp-pinned exact-decimal line revenue (the q_rel_order_revenue
    // discipline); shares are one IEEE division on the decimal pair
    "q_rel_market_share" ->
      """WITH byn AS (
        |  SELECT year(o_orderdate) AS o_year, n_name,
        |    sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |yt AS (SELECT o_year, sum(rev) AS year_rev FROM byn GROUP BY 1)
        |SELECT byn.o_year, byn.n_name,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  round(CAST(rev AS DOUBLE) / CAST(year_rev AS DOUBLE), 6) AS share
        |FROM byn JOIN yt USING (o_year) ORDER BY 1, 2
        |""".stripMargin,
  )
}
