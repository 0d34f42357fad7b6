package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Size-targeted sharding: byte-mass bounds, contiguity of the virtual
  * concatenation, layout determinism, and the loud-failure contract.
  */
class ShardAssignSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = {
    val rnd = new scala.util.Random(11)
    (1L to 400L).map(i => (i, 50L + rnd.nextInt(400)))
  }

  test("every shard's byte mass is within one document of the target") {
    val T = 2000L
    val df = docs.toDF("id", "nb")
    val maxDoc = docs.map(_._2).max
    val manifest = ShardAssign.shardManifest(
        ShardAssign.assignShards(df, "id", col("nb"), T), col("nb"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val last = manifest.last._1
    manifest.foreach { case (s, _, bytes) =>
      assert(bytes <= T + maxDoc - 1, s"shard $s too big: $bytes")
      if (s != last) assert(bytes >= T - maxDoc + 1, s"shard $s too small: $bytes")
    }
    // no shard ids skipped; total mass conserved
    assert(manifest.map(_._1).toSeq == (0L to last).toSeq)
    assert(manifest.map(_._3).sum == docs.map(_._2).sum)
  }

  test("bytes_before is a contiguous gap-free concatenation offset") {
    val out = ShardAssign.assignShards(docs.toDF("id", "nb"), "id", col("nb"), 1000L)
      .select("id", "nb", "bytes_before")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    var expected = 0L
    out.foreach { case (_, nb, before) =>
      assert(before == expected)
      expected += nb
    }
  }

  test("assignment is a pure function of (id, seed): layout-invariant") {
    val a = ShardAssign.assignShards(docs.toDF("id", "nb"), "id", col("nb"), 1500L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    val b = ShardAssign.assignShards(
        docs.toDF("id", "nb").repartition(13), "id", col("nb"), 1500L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(a == b)
    val c = ShardAssign.assignShards(docs.toDF("id", "nb"), "id", col("nb"), 1500L,
        seed = "other")
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(a != c) // different seed, different mix
  }

  test("windows are bucket-partitioned, never a global sort of data rows") {
    val df = docs.toDF("id", "nb")
    val plan = ShardAssign.assignShards(df, "id", col("nb"), 1000L, nBuckets = 8)
      .queryExecution.executedPlan.toString
    // the only Window must be partitioned by the bucket column
    assert(plan.contains("__bucket"), plan)
    assert(!plan.contains("Window [") || !plan.contains("partitionBy=[]"), plan)
  }

  test("null byte size fails loudly with the offending id") {
    val df = Seq((1L, Some(10L)), (2L, None)).toDF("id", "nb")
    val e = intercept[Exception] {
      ShardAssign.assignShards(df, "id", col("nb"), 100L).collect()
    }
    assert(e.getMessage.contains("null byte size") ||
      (e.getCause != null && e.getCause.getMessage.contains("null byte size")))
  }
}
