package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, attach the single right
  * row with the greatest right time <= the left time (`backward`) or the
  * least right time >= it (`forward`) among rows sharing the join keys.
  * The pandas `merge_asof` / Flink temporal-join analog, which Spark SQL
  * lacks natively. Beyond-reference (builder prompt): point-in-time feature
  * attachment is the canonical leakage guard in panel/time-series feature
  * engineering, the same discipline panelsplit's period splits enforce at
  * fold granularity (reference README.md:1-40).
  *
  * Scale shape: ONE shuffle. Both sides union into a single frame keyed by
  * the join keys; the match is a running `last(_, ignoreNulls)` window
  * inside each key partition, so there is no row-multiplying join, no
  * per-left-row probe, and no broadcast of either side. Cost is a sort
  * within each key partition — the minimum any time-ordered semantics can
  * pay — and it holds at 100 TB as long as no single key dwarfs a
  * partition (the same contract as any per-key window; salt upstream if a
  * key is pathological).
  */
object AsOfJoin {

  /** @param keys      equi-join key columns (present on both sides)
    * @param leftTime  left ordering column name
    * @param rightTime right ordering column name (any mutually orderable
    *                  type: timestamp, numeric, date)
    * @param direction "backward" (match latest right <= left, the default)
    *                  or "forward" (match earliest right >= left); equal
    *                  times always match, as pandas' allow_exact_matches
    * @param within    optional tolerance predicate over (leftTime,
    *                  matchedRightTime); a match failing it is nulled out,
    *                  e.g. `(l, r) => l.cast("long") - r.cast("long") <= 3600`
    * @param rightPrefix prepended to every non-key right column in the
    *                  output (avoids collisions; keys appear once)
    * @return left columns unchanged, plus each non-key right column of the
    *         matched row (null where no match) as `rightPrefix + name`
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      direction: String = "backward",
      within: Option[(Column, Column) => Column] = None,
      rightPrefix: String = "r_"): DataFrame = {
    require(Seq("backward", "forward").contains(direction),
      s"direction must be backward|forward, got '$direction'")

    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val rightPayload = right.columns.filterNot(keys.contains).toSeq

    val lvExpr = struct(leftPayload.map(col): _*)
    val rvExpr = struct(rightPayload.map(col): _*)
    val lvType = left.select(lvExpr.as("v")).schema("v").dataType
    val rvType = right.select(rvExpr.as("v")).schema("v").dataType

    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lvExpr.as("__lv"), lit(null).cast(rvType).as("__rv")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lvType).as("__lv"), rvExpr.as("__rv")): _*)

    // Traversal order puts every matchable right row BEFORE the left row it
    // can serve: ascending time for backward, descending for forward; at
    // equal times the right side (side 0) sorts first so exact matches
    // land. Among same-key-same-time right rows the payload struct breaks
    // the tie deterministically (greatest payload wins under backward).
    val ord: Seq[Column] = direction match {
      case "backward" => Seq(col("__t").asc, col("__side").asc, col("__rv").asc_nulls_first)
      case "forward"  => Seq(col("__t").desc, col("__side").asc, col("__rv").desc_nulls_first)
    }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = last(col("__rv"), ignoreNulls = true).over(w)
    val u = l2.unionByName(r2)
      .withColumn("__m", matchedRaw)
      .filter(col("__side") === 1)

    val tolApplied = within match {
      case Some(p) =>
        u.withColumn("__m",
          when(col("__m").isNotNull && p(col("__t"), col("__m").getField(rightTime)), col("__m")))
      case None => u
    }

    tolApplied.select(
      keys.map(col) ++
        leftPayload.map(c => col("__lv").getField(c).as(c)) ++
        rightPayload.map(c => col("__m").getField(c).as(rightPrefix + c)): _*)
  }
}
