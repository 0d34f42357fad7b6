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
    val rowAggs = Seq(count(lit(1)).cast("long").as("__n")) ++ checks.collect {
      case NotNull(n, c, _) => count(c).cast("long").as(s"__$n")
      case Satisfies(n, p, _) => sum(when(p, 1L).otherwise(0L)).as(s"__$n")
    }
    val base = df.agg(rowAggs.head, rowAggs.tail: _*)
    val uniques = checks.collect { case u: Unique => u }
    val withU = uniques.foldLeft(base) { (acc, u) =>
      acc.crossJoin(broadcast(
        df.select(u.keys: _*).distinct().agg(count(lit(1)).cast("long").as(s"__${u.name}"))))
    }
    val rows = checks.map {
      case NotNull(n, _, f) =>
        struct(lit(n).as("check"), lit("not_null").as("kind"),
          col(s"__$n").as("passed"), col("__n").as("total"),
          round(col(s"__$n").cast("double") / col("__n"), 6).as("metric"),
          (col(s"__$n").cast("double") / col("__n") >= f).as("ok"))
      case Satisfies(n, _, f) =>
        struct(lit(n).as("check"), lit("satisfies").as("kind"),
          col(s"__$n").as("passed"), col("__n").as("total"),
          round(col(s"__$n").cast("double") / col("__n"), 6).as("metric"),
          (col(s"__$n").cast("double") / col("__n") >= f).as("ok"))
      case Unique(n, _) =>
        struct(lit(n).as("check"), lit("unique").as("kind"),
          col(s"__$n").as("passed"), col("__n").as("total"),
          round(col(s"__$n").cast("double") / col("__n"), 6).as("metric"),
          (col(s"__$n") === col("__n")).as("ok"))
      case RowCount(n, lo, hi) =>
        struct(lit(n).as("check"), lit("row_count").as("kind"),
          col("__n").as("passed"), col("__n").as("total"),
          lit(1.0).as("metric"),
          (col("__n") >= lo && col("__n") <= hi).as("ok"))
    }
    withU.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check"), col("r.kind"), col("r.passed"), col("r.total"),
        col("r.metric"), col("r.ok"))
      .orderBy("check")
  }
}
