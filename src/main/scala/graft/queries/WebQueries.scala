package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Tables, WarcSource}
import graft.text.HtmlExtract
import graft.text.TextFunctions.hash60

/** Crawl-ingest front door: WARC container parsing + HTML → text
  * extraction (beyond-reference — the step that turns a Common Crawl dump
  * into the `documents` frame every other operator consumes).
  *
  * Fixture discipline (same pattern as the multimodal gates): the corpus
  * is serialized into real `.warc`/`.warc.gz` archives built from the
  * `documents` table by deterministic construction — each doc becomes an
  * HTTP `response` record wrapping an HTML page whose markup exercises
  * script/style/comment stripping, numeric + named character references,
  * and the robots-noindex meta; every 13th doc is planted as a corrupt
  * record (mangled magic) and every archive carries a `warcinfo` header
  * record. The Spark side REALLY writes, gunzips, parses, resyncs, and
  * extracts; the DuckDB oracle replays the construction arithmetic.
  */
object WebQueries extends QueryPack {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.cached(spark, dir, "documents")

  // ---- single-source-of-truth HTML scaffold (used by fixture AND oracle)
  private val PRE_TITLE = "<!doctype html><html><head><title>Doc "
  private val POST_TITLE = "</title>"
  private val META_NOINDEX = "<meta name=\"robots\" content=\"noindex,nofollow\">"
  private val HEAD_REST = "<style>p { color: red; } /* > */</style>" +
    "<script>if (1 < 2) { alert(\"</b>\"); }</script>" +
    "<!-- <p>not text</p> --></head><body><h1>Doc &amp; He&#97;ding "
  private val BODY_OPEN = "</h1><p>"
  private val TAIL = "</p></body></html>"
  private val HTTP_HDR = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"

  private val N_FILES = 8
  private val CORRUPT_MOD = 13 // doc_id % 13 == 5 → mangled magic
  private val NOINDEX_MOD = 7 // doc_id % 7 == 0 → robots noindex

  /** Write the WARC fixture for `dir`'s documents; returns its path.
    * Rebuilt on every call (cheap: one pass over the corpus) so gates stay
    * independent and idempotent.
    */
  private def warcFixture(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val path = s"target/warc/docs_${math.abs(dir.hashCode)}"
    val d = docs(spark, dir)
    val html = concat(
      lit(PRE_TITLE), col("doc_id"), lit(POST_TITLE),
      when(pmod(col("doc_id"), lit(NOINDEX_MOD)) === 0, lit(META_NOINDEX)).otherwise(lit("")),
      lit(HEAD_REST), col("doc_id"), lit(BODY_OPEN),
      // character-reference round trip: 'a' → numeric decimal, 'o' → hex
      // ('&#97;' contains no 'o', so the replace order cannot cascade)
      regexp_replace(regexp_replace(col("text"), "a", "&#97;"), "o", "&#x6F;"),
      lit(TAIL))
    val responses = d.select(
      pmod(col("doc_id"), lit(N_FILES)).cast("int").as("fileNo"),
      (pmod(col("doc_id"), lit(N_FILES)) % 3 === 0).as("gzip"),
      col("doc_id").cast("long").as("seq"),
      when(pmod(col("doc_id"), lit(CORRUPT_MOD)) === 5, lit("WARX/1.0"))
        .otherwise(lit("WARC/1.0")).as("version"),
      lit("response").as("warcType"),
      concat(lit("<urn:uuid:doc-"), col("doc_id"), lit(">")).as("recordId"),
      concat(lit("http://example.com/doc/"), col("doc_id")).as("targetUri"),
      lit("2026-01-01T00:00:00Z").as("warcDate"),
      lit("application/http; msgtype=response").as("contentType"),
      concat(lit(HTTP_HDR), html).cast("binary").as("payload"))
    val infos = spark.range(N_FILES).select(
      col("id").cast("int").as("fileNo"),
      (col("id") % 3 === 0).as("gzip"),
      lit(-1L).as("seq"), // warcinfo leads its archive
      lit("WARC/1.0").as("version"),
      lit("warcinfo").as("warcType"),
      concat(lit("<urn:uuid:info-"), col("id"), lit(">")).as("recordId"),
      lit(null).cast("string").as("targetUri"),
      lit("2026-01-01T00:00:00Z").as("warcDate"),
      lit("application/warc-fields").as("contentType"),
      lit("software: graft\r\n").cast("binary").as("payload"))
    WarcSource.writeWarc(responses.unionByName(infos).as[WarcSource.OutRecord], path)
    path
  }

  /** Record-level accounting over the parsed archives: per WARC type (with
    * quarantined spans as type `__corrupt`), record count and distinct
    * archive count. Proves magic/header/content-length framing, gzip
    * transparency, file placement, and corrupt-resync each cost exactly
    * one record.
    */
  private def warcSourceQ(spark: SparkSession, dir: String): DataFrame = {
    val rows = WarcSource.readWarc(spark, warcFixture(spark, dir))
    rows.select(coalesce(col("warc_type"), lit("__corrupt")).as("warc_type"), col("file"))
      .groupBy(col("warc_type"))
      .agg(count(lit(1)).as("n_records"), countDistinct(col("file")).as("n_files"))
      .orderBy(col("warc_type"))
  }

  /** Full ingest: parse → HTTP body → HTML → text + noindex, keyed back to
    * the corpus by the doc id parsed from the target URI. The per-lang
    * checksum pins the EXACT extracted string (title line + entity-decoded
    * heading + body text) cross-engine.
    */
  private def htmlExtractQ(spark: SparkSession, dir: String): DataFrame = {
    HtmlExtract.register(spark)
    val rows = WarcSource.readWarc(spark, warcFixture(spark, dir))
    val pages = rows.filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("http_status"),
        HtmlExtract.htmlToText(col("body").cast("string")).as("extracted"),
        HtmlExtract.htmlNoindex(col("body").cast("string")).as("noindex"))
    aggregatePages(spark, dir, pages)
  }

  /** Shared close for the batch and streamed ingest gates: key pages back
    * to the corpus by the doc id in the URI, per-lang accounting + exact
    * content checksum.
    */
  private def aggregatePages(spark: SparkSession, dir: String, pages: DataFrame): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("lang"))
    pages.join(d, "doc_id")
      .withColumn("h", hash60(md5(col("extracted"))))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("noindex"), 1L).otherwise(0L)).as("n_noindex"),
        min(col("http_status")).as("min_status"),
        max(col("http_status")).as("max_status"),
        sum(length(col("extracted"))).as("sum_chars"),
        expr("bit_xor(h)").as("content_checksum"))
      .orderBy(col("lang"))
  }

  /** Streamed crawl ingest (archive-per-trigger) closed with the same
    * aggregation — per-archive independence makes it verifiable by the
    * batch oracle verbatim.
    */
  private def streamWarcQ(spark: SparkSession, dir: String): DataFrame = {
    val pages = graft.streaming.StreamingOps.streamWarcIngest(
      spark, warcFixture(spark, dir),
      queryName = s"stream_warc_${math.abs(dir.hashCode)}")
    aggregatePages(spark, dir, pages)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_warc_source" -> (warcSourceQ _),
    "q_html_extract" -> ((s, dir) => htmlExtractQ(s, dir)),
    "q_stream_warc" -> (streamWarcQ _),
  )

  def oracleSql: Map[String, String] = Map(
    // counts replay the construction: every non-corrupt doc is a response
    // record; each of the 8 archives has one warcinfo; each planted
    // mangled-magic record quarantines as exactly one span in its archive
    "q_warc_source" ->
      s"""SELECT * FROM (
         |  SELECT '__corrupt' AS warc_type, count(*) AS n_records,
         |         count(DISTINCT doc_id % $N_FILES) AS n_files
         |  FROM documents WHERE doc_id % $CORRUPT_MOD = 5
         |  UNION ALL
         |  SELECT 'response', count(*), count(DISTINCT doc_id % $N_FILES)
         |  FROM documents WHERE doc_id % $CORRUPT_MOD <> 5
         |  UNION ALL
         |  SELECT 'warcinfo', $N_FILES, $N_FILES
         |) ORDER BY warc_type
         |""".stripMargin,
    // the extracted text is pinned exactly: title line, entity-decoded
    // heading line, then the body text (whose &#97;/&#x6F; references
    // decode back to the original characters)
    "q_html_extract" -> htmlExtractOracle,
    // identical semantics — only the ingestion shape differs (streamed
    // archive-per-trigger vs one-shot batch); per-archive independence
    // makes the batch oracle exact for the stream
    "q_stream_warc" -> htmlExtractOracle,
  )

  private lazy val htmlExtractOracle: String =
    s"""WITH e AS (
       |  SELECT lang, (doc_id % $NOINDEX_MOD = 0) AS noindex,
       |         'Doc ' || doc_id || chr(10) || 'Doc & Heading ' || doc_id
       |           || chr(10) || text AS ext
       |  FROM documents WHERE doc_id % $CORRUPT_MOD <> 5)
       |SELECT lang, count(*) AS n_docs,
       |       sum(CASE WHEN noindex THEN 1 ELSE 0 END) AS n_noindex,
       |       200 AS min_status, 200 AS max_status,
       |       sum(length(ext)) AS sum_chars,
       |       bit_xor(CAST(CAST(('0x' || substr(md5(md5(ext)), 1, 15)) AS UBIGINT) AS BIGINT))
       |         AS content_checksum
       |FROM e GROUP BY lang ORDER BY lang
       |""".stripMargin
}
