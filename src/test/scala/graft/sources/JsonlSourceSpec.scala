package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlSourceSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("JSONL round-trip is lossless, including unicode and quotes") {
    val docs = Seq((1L, "plain"), (2L, "with \"quotes\" and \\ backslash"),
      (3L, "unicode: é中文"), (4L, "tab\tand newline-free"))
      .toDF("id", "text")
    val path = "target/test_jsonl/roundtrip"
    JsonlSource.writeJsonl(docs, path)
    val (clean, bad) = JsonlSource.splitCorrupt(JsonlSource.readJsonl(sp, path, schema))
    assert(bad.count() == 0)
    assert(clean.orderBy("id").as[(Long, String)].collect().toSeq ==
      docs.orderBy("id").as[(Long, String)].collect().toSeq)
  }

  test("malformed lines are quarantined, good rows survive") {
    val dir = new java.io.File("target/test_jsonl/corrupt")
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getPath, "part-00000.json"),
      """{"id": 1, "text": "ok"}
        |{not json at all
        |{"id": 2, "text": "also ok"}
        |""".stripMargin)
    val (clean, bad) = JsonlSource.splitCorrupt(JsonlSource.readJsonl(sp, dir.getPath, schema))
    assert(clean.select("id").as[Long].collect().toSet == Set(1L, 2L))
    val badLines = bad.as[String].collect()
    assert(badLines.length == 1 && badLines.head.startsWith("{not json"))
  }

  test("type-mismatched field is quarantined in PERMISSIVE mode, not coerced to garbage") {
    val dir = new java.io.File("target/test_jsonl/typemix")
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getPath, "part-00000.json"),
      """{"id": "not-a-number", "text": "x"}
        |{"id": 7, "text": "fine"}
        |""".stripMargin)
    val (clean, bad) = JsonlSource.splitCorrupt(JsonlSource.readJsonl(sp, dir.getPath, schema))
    assert(clean.select("id").as[Long].collect().toSeq == Seq(7L))
    assert(bad.count() == 1)
  }
}
