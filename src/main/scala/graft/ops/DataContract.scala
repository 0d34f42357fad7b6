package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality contracts (the Deequ/Great-Expectations role,
  * Spark-first): a contract is a set of named checks over one table; the
  * report is ONE row per check with its measured metric and verdict. All
  * checks compile into a SINGLE single-pass aggregate over the table —
  * adding a check adds a column to the agg, never a scan — except
  * uniqueness, which is the one intrinsically grouped check and runs as
  * a distinct-count on its key columns.
  *
  * Metrics are emitted as (numerator, denominator, ratio) so thresholds
  * are auditable; every ratio is a single IEEE division on exact counts.
  */
object DataContract {

  sealed trait Check { def name: String }
  /** Fraction of non-null values must be ≥ minFrac (1.0 = NOT NULL). */
  final case class NotNull(name: String, column: Column, minFrac: Double = 1.0) extends Check
  /** Fraction of rows satisfying `predicate` must be ≥ minFrac. */
  final case class Satisfies(name: String, predicate: Column, minFrac: Double = 1.0) extends Check
  /** The key columns must be unique (distinct count == row count). */
  final case class Unique(name: String, keys: Seq[Column]) extends Check
  /** Row count must lie in [lo, hi]. */
  final case class RowCount(name: String, lo: Long, hi: Long) extends Check

  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty contract")
    // collision-proof internal aliases (round-7 ADVICE fix): checks are
    // addressed by INDEX, not by user-supplied name — two checks sharing a
    // name, or one literally named "n", previously collided with each other
    // or the __n row-count column
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name).diff(checks.map(_.name).distinct).distinct.mkString(", ")}")
    val idx = checks.zipWithIndex.toMap
    def a(c: Check) = s"__c${idx(c)}"
    val rowAggs = Seq(count(lit(1)).cast("long").as("__total")) ++ checks.collect {
      case ck @ NotNull(_, c, _) => count(c).cast("long").as(a(ck))
      case ck @ Satisfies(_, p, _) => sum(when(p, 1L).otherwise(0L)).as(a(ck))
    }
    val base = df.agg(rowAggs.head, rowAggs.tail: _*)
    val uniques = checks.collect { case u: Unique => u }
    val withU = uniques.foldLeft(base) { (acc, u) =>
      acc.crossJoin(broadcast(
        df.select(u.keys: _*).distinct().agg(count(lit(1)).cast("long").as(a(u)))))
    }
    val rows = checks.map {
      case ck @ NotNull(n, _, f) =>
        struct(lit(n).as("check"), lit("not_null").as("kind"),
          col(a(ck)).as("passed"), col("__total").as("total"),
          round(col(a(ck)).cast("double") / col("__total"), 6).as("metric"),
          (col(a(ck)).cast("double") / col("__total") >= f).as("ok"))
      case ck @ Satisfies(n, _, f) =>
        struct(lit(n).as("check"), lit("satisfies").as("kind"),
          col(a(ck)).as("passed"), col("__total").as("total"),
          round(col(a(ck)).cast("double") / col("__total"), 6).as("metric"),
          (col(a(ck)).cast("double") / col("__total") >= f).as("ok"))
      case ck @ Unique(n, _) =>
        struct(lit(n).as("check"), lit("unique").as("kind"),
          col(a(ck)).as("passed"), col("__total").as("total"),
          round(col(a(ck)).cast("double") / col("__total"), 6).as("metric"),
          (col(a(ck)) === col("__total")).as("ok"))
      case RowCount(n, lo, hi) =>
        struct(lit(n).as("check"), lit("row_count").as("kind"),
          col("__total").as("passed"), col("__total").as("total"),
          lit(1.0).as("metric"),
          (col("__total") >= lo && col("__total") <= hi).as("ok"))
    }
    withU.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check"), col("r.kind"), col("r.passed"), col("r.total"),
        col("r.metric"), col("r.ok"))
      .orderBy("check")
  }
}
