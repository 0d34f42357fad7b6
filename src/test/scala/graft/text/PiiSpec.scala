package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PiiSpec extends SparkTestBase {
  import spark.implicits._

  test("counts and redaction over mixed PII classes") {
    val df = Seq(
      (0L, "contact alice.smith@corp.example.org or bob@x.io today"),
      (1L, "server 192.168.0.1 and account 123456789012"),
      (2L, "clean text with nothing to hide"),
      (3L, "call 0123456789 or 98765432 now")
    ).toDF("doc_id", "text")
    val out = Pii.piiStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(0L) == ((2, 0, 0)))
    assert(out(1L) == ((0, 1, 1)))
    assert(out(2L) == ((0, 0, 0)))
    assert(out(3L) == ((0, 0, 2)))
  }

  test("redact replaces with type tags in the documented order") {
    val df = Seq((0L, "x 1.2.3.4 y a@b.co z 555123456789")).toDF("doc_id", "text")
    val red = df.select(Pii.redact(col("text"))).as[String].head()
    assert(red == "x <IP> y <EMAIL> z <NUM>")
  }

  test("email local parts with digit runs are not double-counted as numbers") {
    // the digits live inside the email span, which is redacted FIRST
    val df = Seq((0L, "mail me9876543210@example.com ok")).toDF("doc_id", "text")
    val r = Pii.piiStats(df, "doc_id", "text").collect().head
    assert(r.getInt(1) == 1 && r.getInt(3) == 0)
  }

  test("dotted quads are not eaten by the digit-run pass") {
    val df = Seq((0L, "10.20.30.40")).toDF("doc_id", "text")
    val r = Pii.piiStats(df, "doc_id", "text").collect().head
    assert(r.getInt(2) == 1 && r.getInt(3) == 0)
  }
}
