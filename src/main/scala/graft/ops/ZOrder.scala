package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional locality for scan
  * pruning, the `OPTIMIZE ZORDER BY` idea as plain Spark primitives. A
  * table sorted by one column prunes scans on that column only; a table
  * laid out by the bit-interleaved z-value of k columns gives every file a
  * tight min/max range on EVERY interleaved dimension, so predicate
  * pushdown on any of them skips most files. At 100 TB the difference is
  * "read 1/256th of the files for a (customer, date) box query" vs "read
  * every file because date was the sort key and the filter is on
  * customer".
  *
  * All arithmetic is engine-exact integer/bit work (shifts, masks, floor
  * of a < 2^53 integer-ratio double), so a SQL oracle replays the layout
  * decision bit for bit.
  */
object ZOrder {

  /** Quantize a non-negative integral column to [0, 2^bits): linear map
    * of [cmin, cmax] with floor. Exact cross-engine while
    * (cmax−cmin)·(2^bits−1) < 2^53 — both engines then divide the same
    * exact integers and floor the same correctly-rounded double. Callers
    * quantizing wider domains should pre-shift the column instead.
    */
  def quantize(c: Column, cmin: Column, cmax: Column, bits: Int): Column = {
    val m = (1L << bits) - 1
    floor((c - cmin).cast("double") * m / (cmax - cmin).cast("double")).cast("long")
  }

  /** Bit-interleave k quantized columns (each in [0, 2^bits)) into one
    * z-value: bit b of column i lands at position b·k + i. The expression
    * is a constant-folded sum of bits·k shift/mask terms — pure codegen,
    * no UDF, no loop at runtime.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 62,
      s"need 1..62 total bits; got ${cols.size} cols x $bits bits")
    val k = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ + _)
  }

  /** Assign the z-curve tile: the top `bucketBits` bits of a
    * `totalBits`-wide z-value. Tiles are axis-aligned boxes (each
    * dimension's top bits), deterministic — no sampled range boundaries —
    * so layouts are reproducible run to run and engine to engine.
    */
  def tile(z: Column, totalBits: Int, bucketBits: Int): Column =
    shiftright(z, totalBits - bucketBits)

  /** Cluster rows for writing: one partition per z-tile, rows z-sorted
    * within — the layout a `partitionBy`/file-per-bucket writer then
    * turns into prunable files with tight per-dimension min/max stats.
    */
  def layout(df: DataFrame, zCol: Column, totalBits: Int, bucketBits: Int): DataFrame = {
    val withZ = df.withColumn("__z", zCol)
      .withColumn("__tile", tile(col("__z"), totalBits, bucketBits))
    withZ.repartition(1 << bucketBits, col("__tile"))
      .sortWithinPartitions(col("__z"))
  }
}
