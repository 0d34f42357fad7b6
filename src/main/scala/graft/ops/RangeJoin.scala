package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — beyond-reference. Spark has no native
  * interval-join operator: a join whose ONLY predicate is a range condition
  * (`point BETWEEN start AND end`) falls back to BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) compares and a broadcast of a whole side — or,
  * without a broadcastable side, a cartesian product. Flink's interval join
  * and the range-bucketing trick in every distributed SQL engine solve this
  * by discretizing time; this operator is that plan shape on Spark
  * primitives:
  *
  *   - each POINT computes one bucket id `ts div width` (row-local),
  *   - each INTERVAL explodes to the few buckets it overlaps,
  *   - the join is then a plain EQUI-join on (equiKeys…, bucket) — hash
  *     join, AQE-eligible, broadcastable — with the exact range predicate
  *     applied as a residual filter.
  *
  * No duplicates can survive: a point matches an interval through exactly
  * its OWN bucket (the interval's exploded copies are distinct buckets), so
  * the residual filter sees each qualifying (point, interval) pair at most
  * once — no post-join dedup needed.
  *
  * The explode factor is `len(interval)/width + 1`, so width should be on
  * the order of the typical interval length; `maxBucketsPerInterval` makes
  * the bound EXPLICIT — an interval that would fan out wider fails loudly
  * (`raise_error`) instead of silently multiplying the build side, the same
  * bounded-explode discipline as `text/Packing.packFill`.
  *
  * Bucket ids use integral `div`, not float `floor(x / w)` — exact at any
  * epoch magnitude (a double quotient could flip a boundary bucket).
  */
object RangeJoin {

  private def divBucket(c: Column, w: Long): Column =
    (c - pmod(c, lit(w))) / lit(w) cast "long"

  /** Join points (`tsCol`: integral, e.g. epoch micros) to intervals
    * (`[startCol, endCol)` in the same units) with optional extra equi
    * keys. Interval ends are exclusive.
    */
  def joinPointsToIntervals(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, equiKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 8): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val firstB = divBucket(col(startCol), bucketWidth)
    val lastB = divBucket(col(endCol) - 1, bucketWidth)
    val nb = lastB - firstB + 1
    val p = points.withColumn("__bucket", divBucket(col(tsCol), bucketWidth))
    val iv = intervals
      .withColumn("__nb",
        when(nb <= maxBucketsPerInterval, nb)
          .otherwise(raise_error(concat(
            lit("rangeJoin: interval ["), col(startCol).cast("string"), lit(", "),
            col(endCol).cast("string"),
            lit(s") spans more than $maxBucketsPerInterval buckets at width $bucketWidth")))))
      .withColumn("__bucket", explode(sequence(firstB, firstB + col("__nb") - 1)))
      .drop("__nb")
    p.join(iv, (equiKeys :+ "__bucket").toSeq)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
