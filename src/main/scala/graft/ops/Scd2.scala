package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension, type 2) history build — turn a capture
  * log (key, capture_ts, tracked attribute) into versioned validity
  * intervals: one row per CHANGE, `[effective_from, effective_to)`, open
  * `effective_to` on the current version. The data-versioning complement
  * of [[SnapshotDiff]] (two-snapshot delta) and the CDX latest-capture
  * rule (freshest only): SCD2 keeps the full lineage queryable by
  * as-of-time predicates — "what did this URL serve last March".
  *
  * Semantics:
  *   1. captures order per key by (ts, tieCol) — the tie column makes the
  *      order total, so the result is layout-independent;
  *   2. a capture is kept iff its tracked attribute differs from the
  *      PREVIOUS capture's (null-safe compare) — consecutive no-op
  *      re-crawls collapse into the version they confirm;
  *   3. kept rows get `effective_from` = own ts, `effective_to` = next
  *      kept row's ts (null = still current), `version` = 1-based change
  *      ordinal.
  *
  * Scale shape: both windows partition by the KEY — the high-cardinality,
  * well-spread axis (URLs at crawl scale) — so per-partition state is one
  * key's handful of captures, never a global sort. The two windows share
  * one partitioning: Catalyst plans a single exchange and re-sorts
  * locally for the second pass. No collect, no driver state.
  */
object Scd2 {

  def buildHistory(captures: DataFrame, keyCol: String, tsCol: String,
      attrCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = captures
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // the first capture always opens version 1 — an explicit marker, not
      // "prev is null": a null ATTRIBUTE on the first capture would
      // otherwise look like a no-op under the null-safe compare and vanish
      .filter(col("__rn") === 1 || not(col("__prev") <=> col(attrCol)))
      .drop("__prev", "__rn")
    changes
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
  }

  /** As-of-time lookup against a built history: the version row whose
    * `[effective_from, effective_to)` interval contains `ts`. A pure
    * filter — no join, no window — so it composes into any downstream
    * plan and pushes down to a history table at rest.
    */
  def asOf(history: DataFrame, ts: Column): DataFrame =
    history.filter(col("effective_from") <= ts &&
      (col("effective_to").isNull || col("effective_to") > ts))
}
