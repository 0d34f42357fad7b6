package graft.queries

import graft.SparkTestBase

/** Every driver-contract query must at least run and return rows at
  * sf0.001 — catches runtime breakage before the driver's Verify pass.
  * Oracle equivalence is checked separately (tools/check_oracle.py).
  */
class QueryPackSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
