package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass MinHash signature aggregate: consumes the 60-bit shingle hash
  * (already reduced mod p) and maintains all k per-function minima in a
  * single primitive-array buffer.
  *
  * Replaces the explode × k-hash-functions plan shape: the k-way expansion
  * happens inside the aggregation buffer (map-side, zero extra rows) instead
  * of multiplying the shuffle input by k. Same arithmetic as
  * [[graft.dedup.Dedup.minhashParams]] — identical signatures, so the DuckDB
  * oracles are unchanged.
  */
class MinHashAggregator(k: Int, as: Array[Long], bs: Array[Long], p: Long)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = (as(i) * x + bs(i)) % p
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.longArray
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoderHelper.longSeq
}

private[functions] object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  val longSeq: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinHashAggregator {
  /** Column form: `minhashSig(xCol)` → array<bigint> of k minima. */
  def column(k: Int, params: Seq[(Int, Long, Long)], p: Long): Column => Column = {
    val as = params.sortBy(_._1).map(_._2).toArray
    val bs = params.sortBy(_._1).map(_._3).toArray
    val agg = new MinHashAggregator(k, as, bs, p)
    val udafFn = org.apache.spark.sql.functions.udaf(agg)
    (x: Column) => udafFn(x)
  }
}
