package graft.cv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One cross-validation fold expressed in *period space*: the sets of period
  * values whose rows belong to the train / test side, plus the resolved
  * snapshot (data-vintage) value when snapshot semantics are active.
  *
  * This replaces the reference's positional row-index arrays
  * (`panelsplit/cross_validation.py:159-201`): Spark rows are unordered, so
  * fold membership is a *predicate* over columns, realized lazily — nothing is
  * materialized until an action, and period predicates push down to the
  * parquet scan (min/max row-group pruning on the period column).
  */
final case class PeriodFold(
    index: Int,
    trainPeriods: Vector[Any],
    testPeriods: Vector[Any],
    snapshot: Option[Any]) {

  private def membership(periods: Vector[Any], periodsCol: String, snapshotCol: Option[String]): Column = {
    val p =
      if (periods.isEmpty) lit(false)
      else col(periodsCol).isin(periods: _*)
    (snapshotCol, snapshot) match {
      case (Some(sc), Some(sv)) => p && col(sc) === lit(sv)
      case _                    => p
    }
  }

  def trainPredicate(periodsCol: String, snapshotCol: Option[String] = None): Column =
    membership(trainPeriods, periodsCol, snapshotCol)

  def testPredicate(periodsCol: String, snapshotCol: Option[String] = None): Column =
    membership(testPeriods, periodsCol, snapshotCol)
}

/** Panel-data cross-validation splitter: expanding-window folds over the
  * distinct sorted period axis, broadcast back to row space as predicates.
  *
  * Mirrors the reference `PanelSplit` (`panelsplit/cross_validation.py:41-201`)
  * including the include-train-in-test variants (`:139-157`) and snapshot
  * clamping (`:172-184`), re-expressed Spark-first: the period axis (small by
  * construction) is collected once on the driver; all row-level work stays
  * lazy DataFrame predicates / broadcast joins.
  */
final class PanelSplit private (
    val folds: Vector[PeriodFold],
    val periodsCol: String,
    val snapshotCol: Option[String]) extends Serializable {

  def nSplits: Int = folds.size

  def getNSplits: Int = nSplits

  /** Lazy per-fold (train, test) DataFrames. Cache `df` before iterating if
    * you will trigger one action per fold (expanding trains re-read the same
    * leading periods: fold i's train ⊆ fold i+1's train).
    */
  def split(df: DataFrame): Seq[(DataFrame, DataFrame)] =
    folds.map { f =>
      (df.filter(f.trainPredicate(periodsCol, snapshotCol)),
       df.filter(f.testPredicate(periodsCol, snapshotCol)))
    }

  /** Rows appearing in ANY fold's train (`side=_.trainPredicate`) or test
    * side. Reference: `_gen_labels` dedup-union of fold positions
    * (`cross_validation.py:279-297`); here a single OR-of-predicates filter —
    * one scan, no duplication, so no dedup step is needed.
    */
  private def genLabels(df: DataFrame, side: PeriodFold => Column): DataFrame = {
    val pred = folds.map(side).reduceOption(_ || _).getOrElse(lit(false))
    df.filter(pred)
  }

  def genTrainLabels(df: DataFrame): DataFrame =
    genLabels(df, _.trainPredicate(periodsCol, snapshotCol))

  def genTestLabels(df: DataFrame): DataFrame =
    genLabels(df, _.testPredicate(periodsCol, snapshotCol))

  /** Fold expansion: every fold's (train ∪ test) rows tagged with `split` and
    * `snapshot_period` — rows deliberately duplicate across folds
    * (`cross_validation.py:355-428`).
    *
    * Implemented as ONE scan + broadcast hash join against a tiny
    * (period → split, snapshot_period) membership table, instead of the
    * reference's n_splits re-reads — the single-scan path of SURVEY §7.3. At
    * 100 TB the duplication cost is inherent to the semantics; the join adds
    * no shuffle (fold side broadcasts).
    *
    * `snapshot_period` = max period value *present in the fold's rows*
    * (`cross_validation.py:413-414` takes the max over the selected rows, not
    * over the fold spec), computed from the tiny distinct-period set of `df`.
    */
  def genSnapshots(df: DataFrame, periodCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val pc = periodCol.getOrElse(periodsCol)
    // distinct (fold-period, snapshot-period, snapshot-filter value) triples
    // actually present — tiny. The third element carries the snapshot column
    // so the per-fold max is taken over the SNAPSHOT-FILTERED rows, matching
    // the reference (`cross_validation.py:407-414` computes the max over the
    // selected rows, which in snapshot mode are already vintage-filtered).
    val snapExpr = snapshotCol.map(col).getOrElse(lit(null))
    val presentTriples: Seq[(Any, Any, Any)] =
      df.select(col(periodsCol), col(pc), snapExpr).distinct().collect()
        .map(r => (r.get(0), r.get(1), r.get(2))).toSeq

    import scala.jdk.CollectionConverters._
    val rows = folds.flatMap { f =>
      val foldPeriods = (f.trainPeriods ++ f.testPeriods).distinct
      val present = presentTriples.filter { case (p, _, s) =>
        foldPeriods.contains(p) && ((snapshotCol, f.snapshot) match {
          case (Some(_), Some(sv)) => s == sv
          case _                   => true
        })
      }
      if (present.isEmpty) Nil
      else {
        val last = present.map(_._2).max(PanelSplit.anyOrdering)
        foldPeriods.map(p => org.apache.spark.sql.Row(p, f.index, last))
      }
    }
    val periodType = df.schema(periodsCol).dataType
    val pcType = df.schema(pc).dataType
    val memSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__ps_period", periodType),
      org.apache.spark.sql.types.StructField("split", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("snapshot_period", pcType)))
    val membership = spark.createDataFrame(rows.asJava, memSchema)

    val joined = df.join(
      broadcast(membership),
      col(periodsCol) === col("__ps_period"),
      "inner").drop("__ps_period")
    snapshotCol match {
      case Some(sc) =>
        // snapshot equality must hold per fold
        val keep = folds.map { f =>
          f.snapshot match {
            case Some(sv) => col("split") === f.index && col(sc) === lit(sv)
            case None     => col("split") === f.index
          }
        }.reduceOption(_ || _).getOrElse(lit(true))
        joined.filter(keep)
      case None => joined
    }
  }

  /** Intended semantics of the reference's `drop_splits`
    * (`cross_validation.py:431-470`): drop every fold whose train or test side
    * is empty or has ≤ 1 distinct non-degenerate `y` value. The reference
    * mutates its fold list while iterating (skipping the element after each
    * drop); we evaluate ALL folds — documented divergence (SURVEY §4).
    *
    * Two physical plans, same semantics: up to [[PanelSplit.DROP_SPLITS_CONDITIONAL_MAX]]
    * folds, one scan with conditional aggregates (4 per fold — each
    * `countDistinct` adds an Expand branch, so plan width is O(nSplits));
    * beyond that, a broadcast fold-membership join + ONE `groupBy(fold,
    * side)` aggregation whose plan is constant-width regardless of fold
    * count (rows duplicate by fold membership instead — the right trade at
    * hundreds of folds).
    */
  def dropSplits(df: DataFrame, yCol: String): PanelSplit = {
    val counts =
      if (folds.size <= PanelSplit.DROP_SPLITS_CONDITIONAL_MAX) dropSplitCountsConditional(df, yCol)
      else dropSplitCountsExploded(df, yCol)
    val kept = folds.filter { f =>
      val (trN, trU) = counts.getOrElse((f.index, "train"), (0L, 0L))
      val (teN, teU) = counts.getOrElse((f.index, "test"), (0L, 0L))
      !(trN == 0 || teN == 0 || trU == 1 || teU == 1)
    }
    folds.diff(kept).foreach { f =>
      // match the reference's user-visible notice (printed, not thrown)
      System.err.println(
        s"Dropping split ${f.index} as either the test or train set is either empty or contains only one unique value.")
    }
    new PanelSplit(kept, periodsCol, snapshotCol)
  }

  /** (fold, side) → (rowCount, distinct-y-with-null) via per-fold
    * conditional aggregates in one scan.
    */
  private[cv] def dropSplitCountsConditional(df: DataFrame, yCol: String): Map[(Int, String), (Long, Long)] = {
    val aggs = folds.flatMap { f =>
      val tr = f.trainPredicate(periodsCol, snapshotCol)
      val te = f.testPredicate(periodsCol, snapshotCol)
      // "distinct y" counts null as one extra value — np.unique keeps NaN
      // (`cross_validation.py:23-38`), countDistinct drops nulls.
      def uniq(pred: Column) =
        (countDistinct(when(pred, col(yCol))) +
          coalesce(max(when(pred && col(yCol).isNull, 1).otherwise(0)), lit(0))).cast("long")
      Seq(
        count(when(tr, 1)).as(s"tr_n_${f.index}"),
        count(when(te, 1)).as(s"te_n_${f.index}"),
        uniq(tr).as(s"tr_u_${f.index}"),
        uniq(te).as(s"te_u_${f.index}"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    folds.flatMap { f =>
      Seq(
        (f.index, "train") -> ((row.getAs[Long](s"tr_n_${f.index}"), row.getAs[Long](s"tr_u_${f.index}"))),
        (f.index, "test") -> ((row.getAs[Long](s"te_n_${f.index}"), row.getAs[Long](s"te_u_${f.index}"))))
    }.toMap
  }

  /** Same counts via a broadcast (period → fold, side, snapshot) membership
    * join and a single constant-width aggregation — scales to any fold
    * count. Sides missing from the result are genuinely empty.
    */
  private[cv] def dropSplitCountsExploded(df: DataFrame, yCol: String): Map[(Int, String), (Long, Long)] = {
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val periodType = df.schema(periodsCol).dataType
    val rows = folds.flatMap { f =>
      f.trainPeriods.map(p => org.apache.spark.sql.Row(p, f.index, "train")) ++
        f.testPeriods.map(p => org.apache.spark.sql.Row(p, f.index, "test"))
    }
    val memSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__ds_period", periodType),
      org.apache.spark.sql.types.StructField("__ds_fold", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__ds_side", org.apache.spark.sql.types.StringType, nullable = false)))
    val membership = spark.createDataFrame(rows.asJava, memSchema)
    // per-fold snapshot equality must still hold where configured
    val snapKeep: Column = snapshotCol match {
      case Some(sc) =>
        folds.map { f =>
          f.snapshot match {
            case Some(sv) => col("__ds_fold") === f.index && col(sc) === lit(sv)
            case None     => col("__ds_fold") === f.index
          }
        }.reduceOption(_ || _).getOrElse(lit(true))
      case None => lit(true)
    }
    df.join(broadcast(membership), col(periodsCol) === col("__ds_period"), "inner")
      .filter(snapKeep)
      .groupBy(col("__ds_fold"), col("__ds_side"))
      .agg(
        count(lit(1)).as("__n"),
        (countDistinct(col(yCol)) +
          coalesce(max(when(col(yCol).isNull, 1).otherwise(0)), lit(0))).cast("long").as("__u"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
  }
}

object PanelSplit {

  /** Fold-count ceiling for the conditional-aggregate dropSplits plan;
    * above it the constant-width explode-join plan takes over.
    */
  val DROP_SPLITS_CONDITIONAL_MAX = 24

  /** Reconstruct from an explicit fold list (persistence / tests). */
  private[graft] def fromFolds(
      folds: Vector[PeriodFold],
      periodsCol: String,
      snapshotCol: Option[String]): PanelSplit =
    new PanelSplit(folds, periodsCol, snapshotCol)

  /** Ordering over the collected period values (Int / Long / Date / Timestamp
    * / String — anything Comparable), used only for tiny driver-side sets.
    */
  val anyOrdering: Ordering[Any] = new Ordering[Any] {
    def compare(a: Any, b: Any): Int = (a, b) match {
      case (x: java.lang.Comparable[_], y) =>
        x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
      case _ => throw new IllegalArgumentException(s"Unorderable period value: $a")
    }
  }

  /** Build folds from a DataFrame: collects the distinct sorted period axis
    * (small by construction — years/months, not rows) and runs the
    * expanding-window arithmetic on the driver. Row-level membership stays
    * lazy.
    */
  def apply(
      df: DataFrame,
      periodsCol: String,
      snapshotCol: Option[String] = None,
      nSplits: Int = 2,
      gap: Int = 0,
      testSize: Int = 1,
      maxTrainSize: Option[Int] = None,
      includeFirstTrainInTest: Boolean = false,
      includeTrainInTest: Boolean = false,
      uniquePeriods: Option[Vector[Any]] = None): PanelSplit = {

    val axis: Vector[Any] = uniquePeriods.getOrElse {
      df.select(col(periodsCol)).na.drop().distinct().orderBy(col(periodsCol))
        .collect().map(_.get(0)).toVector
    }
    val minSnapshot: Option[Any] = snapshotCol.map { sc =>
      df.agg(min(col(sc))).head().get(0)
    }
    fromAxis(axis, periodsCol, snapshotCol, minSnapshot, nSplits, gap, testSize,
      maxTrainSize, includeFirstTrainInTest, includeTrainInTest)
  }

  /** Pure-driver construction from an already-known sorted period axis (used
    * by tests and by callers that manage the axis themselves).
    */
  def fromAxis(
      axis: Vector[Any],
      periodsCol: String,
      snapshotCol: Option[String] = None,
      minSnapshot: Option[Any] = None,
      nSplits: Int = 2,
      gap: Int = 0,
      testSize: Int = 1,
      maxTrainSize: Option[Int] = None,
      includeFirstTrainInTest: Boolean = false,
      includeTrainInTest: Boolean = false): PanelSplit = {

    val firstInTest = includeFirstTrainInTest || includeTrainInTest
    val axisFolds = TimeSeriesSplit.split(
      axis.size, nSplits, gap, Some(testSize), maxTrainSize)

    val folds = axisFolds.zipWithIndex.map { case (af, i) =>
      val trainP = af.train.map(axis).toVector
      var testP = af.test.map(axis).toVector
      // include-train-in-test variants (cross_validation.py:139-157):
      // fold 0 merges train into test when includeFirstTrainInTest; every
      // fold merges when includeTrainInTest (which forces the first flag).
      if ((i == 0 && firstInTest) || (i > 0 && includeTrainInTest))
        testP = trainP ++ testP
      // snapshot resolution with clamp (cross_validation.py:172-184)
      val snap = minSnapshot.map { mn =>
        val maxTest = testP.max(anyOrdering)
        if (anyOrdering.gteq(maxTest, mn)) maxTest
        else {
          System.err.println(
            s"The maximum period value $maxTest for split $i is less than the minimum snapshot value $mn. " +
              s"Defaulting to minimum snapshot value for split $i.")
          mn
        }
      }
      PeriodFold(i, trainP, testP, snap)
    }
    new PanelSplit(folds, periodsCol, snapshotCol)
  }
}
