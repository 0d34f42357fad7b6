package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — beyond-reference (builder prompt: the operations a
  * large-scale training-data pipeline needs). Between two snapshots of a
  * keyed corpus, classify every key as added / removed / changed /
  * unchanged. This is the data-versioning primitive behind incremental
  * release notes ("what moved between v1 and v2"), cache invalidation for
  * derived artifacts (re-embed only changed docs), and audit trails.
  *
  * Scale shape: each side reduces to (key, fingerprint) BEFORE the
  * full-outer equi-join, so the shuffle moves a key plus a 128-bit hash per
  * row — never the document payloads. At 100 TB of text that is a ~1000×
  * shuffle reduction; with both snapshots bucketed on the key
  * (`sources.PartitionedSink.writeBucketedTable`) the join is shuffle-free
  * entirely.
  */
object SnapshotDiff {

  /** Row-level diff: one row per key present in either snapshot, with its
    * status. `fingerprintOf` maps a snapshot to the content-identity
    * column — md5/xxhash of the payload columns; collisions between
    * DIFFERENT contents are the usual 2^-64/2^-128 non-event.
    */
  def diff(a: DataFrame, b: DataFrame, key: String, fingerprintOf: DataFrame => Column): DataFrame = {
    val fa = a.select(col(key), fingerprintOf(a).as("__fp_a"))
    val fb = b.select(col(key), fingerprintOf(b).as("__fp_b"))
    fa.join(fb, Seq(key), "full_outer")
      .select(col(key),
        when(col("__fp_a").isNull, lit("added"))
          .when(col("__fp_b").isNull, lit("removed"))
          .when(col("__fp_a") =!= col("__fp_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Convenience fingerprint: md5 over the named columns, joined on the
    * unit separator (adjacent fields cannot alias); nulls map to NUL,
    * distinct from the empty string.
    */
  def fingerprint(cols: Seq[String]): DataFrame => Column =
    df => md5(concat_ws("\u0001",
      cols.map(c => coalesce(df(c).cast("string"), lit("\u0000"))): _*))
}
