package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware aggregation: two-stage salted groupBy for decomposable
  * aggregates. At 100 TB a handful of hot keys (a dominant event_type, a
  * null-heavy join key) turn a single-stage `groupBy` into one straggler
  * task; salting spreads each hot key over `saltBuckets` partial groups,
  * then a second (tiny) aggregation merges the partials. Exact same results
  * for decomposable aggregates (sum/count/min/max), so the oracle is the
  * plain GROUP BY.
  *
  * (AQE's skew-join handling covers joins; this is the aggregation-side
  * pattern, useful when a single group's partial state is itself huge.)
  */
object Skew {

  /** Skew DIAGNOSTIC: the report that decides whether a key needs salting
    * (saltedStats above), an AQE skew-join hint, or a broadcast. Per-key
    * counts (map-side combined) reduced to the top-`k` hottest keys with
    * their corpus share and a rank. The plan is groupBy + TakeOrdered(k):
    * no global sort, no window over the full key space — the full
    * histogram never leaves the executors, only k rows reach the driver
    * side of the report.
    */
  def topHotKeys(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = df.select(count(lit(1)).as("__total"))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col(keyCol))))
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("__total"), 6))
      .select(col("rank"), col(keyCol), col("n"), col("share"))
  }

  /** Salted count/sum/min/max of `valueCol` grouped by `keyCols`. */
  def saltedStats(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val keyed = df.withColumn("__salt", pmod(crc32(col(valueCol).cast("string")), lit(saltBuckets)))
    val partial = keyed
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol)).as("__sum"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__sum")).as("sum_value"),
        min(col("__min")).as("min_value"),
        max(col("__max")).as("max_value"))
  }
}
