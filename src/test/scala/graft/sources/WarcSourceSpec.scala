package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.WarcSource.{OutRecord, WarcRow}

class WarcSourceSpec extends AnyFunSuite with SparkTestBase {

  private def rec(seq: Long, body: String, version: String = "WARC/1.0",
      warcType: String = "response", fileNo: Int = 0, gzip: Boolean = false): OutRecord = {
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
      .getBytes(StandardCharsets.UTF_8)
    OutRecord(fileNo, gzip, seq, version, warcType, s"<urn:uuid:$seq>",
      s"http://x/$seq", "2026-01-01T00:00:00Z", "application/http; msgtype=response", payload)
  }

  private def parse(records: OutRecord*): Seq[WarcRow] = {
    val bytes = records.flatMap(r => WarcSource.serialize(r).toSeq).toArray
    WarcSource.parseFile("t.warc", bytes)
  }

  test("serialize/parse round-trip: framing, headers, http split") {
    val rows = parse(rec(0, "<p>a</p>"), rec(1, "<p>bb</p>"))
    assert(rows.length == 2)
    assert(rows.map(_.warc_type).toSet == Set("response"))
    assert(rows.map(_.target_uri) == Seq("http://x/0", "http://x/1"))
    assert(rows.forall(_.http_status.contains(200)))
    assert(new String(rows(0).body, StandardCharsets.UTF_8) == "<p>a</p>")
    assert(new String(rows(1).body, StandardCharsets.UTF_8) == "<p>bb</p>")
    assert(rows.forall(_.corrupt == null))
    // offsets: second record starts exactly where the first's bytes end
    assert(rows(1).offset == WarcSource.serialize(rec(0, "<p>a</p>")).length)
  }

  test("non-http payloads (warcinfo, WET conversion) pass body through whole") {
    val info = OutRecord(0, gzip = false, 0, "WARC/1.0", "warcinfo", "<urn:uuid:i>",
      null, "2026-01-01T00:00:00Z", "application/warc-fields",
      "software: graft\r\n".getBytes(StandardCharsets.UTF_8))
    val wet = OutRecord(0, gzip = false, 1, "WARC/1.0", "conversion", "<urn:uuid:c>",
      "http://x/1", "2026-01-01T00:00:00Z", "text/plain",
      "already extracted".getBytes(StandardCharsets.UTF_8))
    val rows = parse(info, wet)
    assert(rows(0).http_status.isEmpty && rows(0).target_uri == null)
    assert(new String(rows(0).body, StandardCharsets.UTF_8) == "software: graft\r\n")
    assert(rows(1).warc_type == "conversion")
    assert(new String(rows(1).body, StandardCharsets.UTF_8) == "already extracted")
  }

  test("a mangled record quarantines as one span and the parser resyncs") {
    val rows = parse(rec(0, "<p>ok0</p>"), rec(1, "<p>bad</p>", version = "WARX/1.0"),
      rec(2, "<p>ok2</p>"))
    assert(rows.length == 3)
    assert(rows(0).corrupt == null && rows(2).corrupt == null)
    val bad = rows(1)
    assert(bad.corrupt == "bad magic" && bad.warc_type == null)
    // the skipped span is exactly the mangled record's serialized bytes
    // (its own trailing CRLFCRLF included — resync lands on record 2's magic)
    assert(bad.content_length == WarcSource.serialize(rec(1, "<p>bad</p>")).length)
    assert(rows(2).target_uri == "http://x/2")
  }

  test("truncated payload quarantines as overrun") {
    val full = WarcSource.serialize(rec(0, "<p>abcdef</p>"))
    val truncated = java.util.Arrays.copyOfRange(full, 0, full.length - 10)
    val rows = WarcSource.parseFile("t.warc", truncated)
    assert(rows.length == 1 && rows(0).corrupt == "payload overruns file")
  }

  test("missing content-length quarantines") {
    val bytes = ("WARC/1.0\r\nWARC-Type: response\r\n\r\npayload")
      .getBytes(StandardCharsets.ISO_8859_1)
    val rows = WarcSource.parseFile("t.warc", bytes)
    assert(rows.length == 1 && rows(0).corrupt == "missing content-length")
  }

  test("negative content-length quarantines (not copyOfRange crash) and resyncs") {
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -7\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val good = WarcSource.serialize(rec(1, "<p>after</p>"))
    val rows = WarcSource.parseFile("t.warc", bad ++ good)
    assert(rows.length == 2)
    assert(rows(0).corrupt == "negative content-length")
    assert(rows(1).corrupt == null && rows(1).target_uri == "http://x/1")
  }

  test("multi-member gzip decompresses transparently (the Common Crawl layout)") {
    val a = WarcSource.serialize(rec(0, "<p>m0</p>"))
    val b = WarcSource.serialize(rec(1, "<p>m1</p>"))
    def gz(x: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(x); g.close(); bos.toByteArray
    }
    val concatenated = gz(a) ++ gz(b) // one gzip member PER RECORD
    val rows = WarcSource.parseFile("t.warc", WarcSource.gunzipAll(concatenated))
    assert(rows.length == 2 && rows.forall(_.corrupt == null))
    assert(new String(rows(1).body, StandardCharsets.UTF_8) == "<p>m1</p>")
  }

  test("writeWarc + readWarc end-to-end over plain and gzip files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warcspec").toString
    val records = (0 until 20).map { i =>
      rec(i.toLong, s"<p>doc$i</p>", fileNo = i % 3, gzip = (i % 3) == 1)
    }
    WarcSource.writeWarc(spark.createDataset(records), dir)
    val got = WarcSource.readWarc(spark, dir)
    assert(got.count() == 20)
    val byFile = got.groupBy("file").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFile == Map("part-0.warc" -> 7L, "part-1.warc.gz" -> 7L, "part-2.warc" -> 6L))
    // content round-trips: every body parses back to its construction
    import org.apache.spark.sql.functions._
    val bodies = got.select(col("target_uri"), col("body").cast("string").as("b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bodies("http://x/7") == "<p>doc7</p>")
    assert(got.where(col("http_status") =!= 200).count() == 0)
    // output-committer discipline: only committed final names remain —
    // no attempt-scoped .tmp files survive a successful write
    val leftover = new java.io.File(dir).listFiles().map(_.getName)
    assert(leftover.forall(n => !n.endsWith(".tmp")), leftover.mkString(","))
    assert(leftover.count(_.startsWith("part-")) == 3)
  }

  test("charset-aware decode: latin-1 bodies survive, a UTF-8 misread would not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val html = "<p>café</p>"
    val mk = (cs: String, bytes: Array[Byte]) => OutRecord(0, gzip = false, 0, "WARC/1.0",
      "response", "<urn:uuid:cs>", "http://x/doc/0", "2026-01-01T00:00:00Z",
      "application/http; msgtype=response",
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=$cs\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ bytes)
    val rows = parse(
      mk("ISO-8859-1", html.getBytes(StandardCharsets.ISO_8859_1)),
      mk("utf-8", html.getBytes(StandardCharsets.UTF_8)))
    assert(rows.forall(_.http_content_type.startsWith("text/html")))
    val decoded = spark.createDataset(rows)
      .select(WarcSource.decodedBody(col("body"), col("http_content_type")).as("t"),
        col("body").cast("string").as("naive"))
      .collect()
    assert(decoded.forall(_.getString(0) == html)) // both charsets round-trip
    // the naive UTF-8 cast mangles the latin-1 byte — that's what the
    // dispatch exists to prevent
    assert(decoded.exists(_.getString(1) != html))
  }

  test("streamed ingest equals the one-shot batch ingest row for row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("warcstream").toString
    val records = (0 until 12).map { i =>
      OutRecord(i % 4, gzip = (i % 4) == 2, i.toLong, "WARC/1.0", "response",
        s"<urn:uuid:$i>", s"http://x/doc/$i", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        (s"HTTP/1.1 200 OK\r\n\r\n<p>body &amp; $i</p>").getBytes(StandardCharsets.UTF_8))
    }
    WarcSource.writeWarc(spark.createDataset(records), dir)
    val streamed = graft.streaming.StreamingOps
      .streamWarcIngest(spark, dir, queryName = "warc_spec_stream")
      .select("doc_id", "extracted", "noindex")
    graft.text.HtmlExtract.register(spark)
    val batch = WarcSource.readWarc(spark, dir)
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        graft.text.HtmlExtract.htmlToText(col("body").cast("string")).as("extracted"),
        graft.text.HtmlExtract.htmlNoindex(col("body").cast("string")).as("noindex"))
    assert(streamed.count() == 12)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.where(col("extracted") === "body & 3").count() == 1)
  }
}
