package graft.sources

import java.io.{BufferedOutputStream, ByteArrayInputStream, ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** WARC (Web ARChive, ISO 28500) ingest — beyond-reference. WARC is the
  * container every Common Crawl dump ships in; a 100 TB curation run
  * starts by turning ~100k multi-hundred-MB `.warc.gz` files into a
  * document frame. Two properties drive the design:
  *
  *   - PER-FILE parallelism. Gzip members and WARC records are not
  *     byte-splittable, so the unit of work is one archive file per task
  *     (exactly how warcio/Common Crawl jobs shard); `binaryFile` is a
  *     non-splittable source, so Spark schedules precisely that. At 100 TB
  *     the file count (~100k) dwarfs any executor count — parallelism
  *     comes from file granularity, not intra-file splits.
  *   - QUARANTINE, not crash, not silence. One truncated record in a
  *     billion must neither kill the job nor vanish: malformed spans
  *     become rows with a `corrupt` reason, and the parser resyncs at the
  *     next `WARC/1.` magic so one bad record costs one record
  *     (the same discipline as [[JsonlSource]]'s PERMISSIVE capture).
  *
  * Gzip: Common Crawl archives are CONCATENATED per-record gzip members;
  * `GZIPInputStream` consumes multi-member streams natively, so one
  * decompress pass covers both whole-file and per-record compression
  * (spec-verified on a two-member stream).
  *
  * HTTP payloads: `response` records carry the full HTTP message; the
  * parser splits status + body once so downstream sees ready-to-extract
  * bytes. `conversion` records (WET — Common Crawl's pre-extracted text
  * flavor) pass their payload through as the body.
  */
object WarcSource {

  /** One parsed record (or one quarantined span, where `warc_type` is null
    * and `corrupt` holds the reason; `content_length` then counts the
    * skipped bytes).
    */
  case class WarcRow(
      file: String,
      offset: Long,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      http_status: Option[Int],
      http_content_type: String,
      body: Array[Byte],
      corrupt: String)

  /** A record to serialize — the writer emits exactly what it is told
    * (including a non-standard `version` line, which fixtures use to plant
    * corrupt records). One output file per `fileNo`; `gzip` must be
    * constant within a file; records are laid out in `seq` order.
    */
  case class OutRecord(
      fileNo: Int,
      gzip: Boolean,
      seq: Long,
      version: String,
      warcType: String,
      recordId: String,
      targetUri: String,
      warcDate: String,
      contentType: String,
      payload: Array[Byte])

  private val CRLF = "\r\n"

  /** Read a directory of `.warc` / `.warc.gz` files into a record frame.
    * One task per file; schema is [[WarcRow]].
    */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.warc*").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap((parseArchive _).tupled)
      .toDF()
  }

  /** Parse one archive (gunzipping by extension) — the shared per-file unit
    * behind [[readWarc]] and the streaming ingest.
    */
  def parseArchive(path: String, raw: Array[Byte]): Seq[WarcRow] = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    parseFile(name, if (name.endsWith(".gz")) gunzipAll(raw) else raw)
  }

  /** Parse one archive's bytes into records + quarantine rows. */
  private[sources] def parseFile(file: String, bytes: Array[Byte]): Seq[WarcRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRow]
    val n = bytes.length
    var p = 0
    def quarantine(from: Int, reason: String): Int = {
      val next = indexOfMagic(bytes, from + 1)
      val end = if (next < 0) n else next
      out += WarcRow(file, from.toLong, null, null, null, null, null,
        (end - from).toLong, None, null, null, reason)
      end
    }
    while (p < n) {
      // skip inter-record padding (spec: two CRLFs follow each record;
      // tolerate extras so hand-built archives still parse)
      while (p < n && (bytes(p) == '\r' || bytes(p) == '\n')) p += 1
      if (p < n) {
        val hdrEnd = indexOf(bytes, "\r\n\r\n", p)
        if (!startsWith(bytes, p, "WARC/")) p = quarantine(p, "bad magic")
        else if (hdrEnd < 0) p = quarantine(p, "unterminated header block")
        else {
          val header = new String(bytes, p, hdrEnd - p, StandardCharsets.ISO_8859_1)
          val fields = header.split("\r\n").drop(1).iterator.flatMap { line =>
            val k = line.indexOf(':')
            if (k < 0) None else Some(line.substring(0, k).trim.toLowerCase -> line.substring(k + 1).trim)
          }.toMap
          fields.get("content-length").flatMap(s => s.toLongOption) match {
            case None => p = quarantine(p, "missing content-length")
            case Some(len) if len < 0 =>
              // a negative length passes the overrun guard below and
              // would reach copyOfRange with to < from — crash, not
              // quarantine; malformed records must cost one record
              p = quarantine(p, "negative content-length")
            case Some(len) if hdrEnd + 4 + len > n =>
              p = quarantine(p, "payload overruns file")
            case Some(len) =>
              val payload = java.util.Arrays.copyOfRange(bytes, hdrEnd + 4, hdrEnd + 4 + (len.toInt))
              val wtype = fields.getOrElse("warc-type", null)
              val ctype = fields.getOrElse("content-type", null)
              val (status, httpCt, body) = splitHttp(wtype, ctype, payload)
              out += WarcRow(file, p.toLong, wtype,
                fields.getOrElse("warc-record-id", null),
                fields.getOrElse("warc-target-uri", null),
                fields.getOrElse("warc-date", null),
                ctype, len, status, httpCt, body, null)
              p = hdrEnd + 4 + len.toInt
          }
        }
      }
    }
    out.toSeq
  }

  /** For `application/http` payloads: (status code, the HTTP-level
    * Content-Type header — it carries the charset the BODY bytes are in —
    * and the message body after the first CRLFCRLF); anything else passes
    * through whole.
    */
  private def splitHttp(wtype: String, ctype: String,
      payload: Array[Byte]): (Option[Int], String, Array[Byte]) = {
    val isHttp = ctype != null && ctype.startsWith("application/http")
    if (!isHttp) return (None, null, payload)
    val sep = indexOf(payload, "\r\n\r\n", 0)
    if (sep < 0) return (None, null, payload)
    val head = new String(payload, 0, sep, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val status = lines.head.split(' ') match {
      case parts if parts.length >= 2 && parts(0).startsWith("HTTP/") => parts(1).toIntOption
      case _ => None
    }
    val httpCt = lines.iterator.drop(1)
      .find(_.toLowerCase.startsWith("content-type:"))
      .map(_.substring("content-type:".length).trim)
      .orNull
    (status, httpCt, java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
  }

  /** Body bytes → string honoring the declared charset: the crawl reality
    * is mixed encodings, and decoding latin-1 bytes as UTF-8 turns every
    * high byte into U+FFFD. Dispatches on the `charset=` parameter of the
    * HTTP Content-Type (case-insensitive, quotes tolerated); UTF-8 is the
    * default for absent/unknown declarations (the HTML5 rule for the
    * no-BOM, no-meta case is locale-dependent — a deterministic pipeline
    * wants one documented default). All branches are codegen'd `decode`
    * calls — sniffing beyond the declaration (BOM, meta, chardet) is NOT
    * attempted; a mis-declared page mis-decodes the same way every
    * engine-independent rerun mis-decodes it.
    */
  def decodedBody(body: org.apache.spark.sql.Column,
      httpContentType: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val cs = lower(regexp_extract(coalesce(httpContentType, lit("")),
      "(?i)charset=\"?([A-Za-z0-9_.:-]+)", 1))
    when(cs === "iso-8859-1" || cs === "latin-1" || cs === "latin1",
        decode(body, "ISO-8859-1"))
      .when(cs === "us-ascii" || cs === "ascii", decode(body, "US-ASCII"))
      .when(cs === "utf-16be", decode(body, "UTF-16BE"))
      .when(cs === "utf-16le", decode(body, "UTF-16LE"))
      .otherwise(decode(body, "UTF-8"))
  }

  /** Serialize records into `path/part-<fileNo>.warc[.gz]`, one file per
    * distinct `fileNo`, records in `seq` order. Partitioning note: files
    * are hash-distributed over tasks and each task streams its files
    * record-by-record — no file is ever whole in memory on the write side.
    * (Local-filesystem writer; a cluster egress would open the same
    * streams through the Hadoop FS API.)
    */
  def writeWarc(records: Dataset[OutRecord], path: String): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    dir.listFiles().foreach(f =>
      if (f.getName.startsWith("part-") || (f.getName.startsWith(".part-") && f.getName.endsWith(".tmp"))) f.delete())
    val nFiles = records.select("fileNo").distinct().count().toInt.max(1)
    records
      .repartition(nFiles, records.col("fileNo"))
      .sortWithinPartitions("fileNo", "seq")
      .foreachPartition { (it: Iterator[OutRecord]) =>
        // Output-committer discipline: under task retry / speculative
        // execution two attempts may run concurrently for the same
        // fileNo; writing the final name directly would interleave the
        // attempts' bytes. Each attempt streams into an attempt-unique
        // .tmp name and atomically renames on successful close — last
        // complete attempt wins, partial attempts never become visible.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(tc => tc.taskAttemptId().toString).getOrElse("local")
        var current: Int = Int.MinValue
        var os: java.io.OutputStream = null
        var tmp: java.io.File = null
        var dst: java.io.File = null
        def commit(): Unit = if (os != null) {
          os.close(); os = null
          java.nio.file.Files.move(
            tmp.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        try {
          it.foreach { r =>
            if (r.fileNo != current) {
              commit()
              current = r.fileNo
              val name = s"part-${r.fileNo}.warc" + (if (r.gzip) ".gz" else "")
              dst = new java.io.File(path, name)
              tmp = new java.io.File(path, s".$name.$attempt.tmp")
              val raw = new BufferedOutputStream(new FileOutputStream(tmp))
              os = if (r.gzip) new GZIPOutputStream(raw) else raw
            }
            os.write(serialize(r))
          }
          commit()
        } finally {
          if (os != null) os.close()
          if (tmp != null && tmp.exists()) tmp.delete()
        }
      }
  }

  private[sources] def serialize(r: OutRecord): Array[Byte] = {
    val header = new StringBuilder()
      .append(r.version).append(CRLF)
      .append("WARC-Type: ").append(r.warcType).append(CRLF)
      .append("WARC-Record-ID: ").append(r.recordId).append(CRLF)
    if (r.targetUri != null) header.append("WARC-Target-URI: ").append(r.targetUri).append(CRLF)
    header.append("WARC-Date: ").append(r.warcDate).append(CRLF)
      .append("Content-Type: ").append(r.contentType).append(CRLF)
      .append("Content-Length: ").append(r.payload.length).append(CRLF)
      .append(CRLF)
    val h = header.toString.getBytes(StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](h.length + r.payload.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(r.payload, 0, out, h.length, r.payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** WET egress: write a text corpus as WARC `conversion` records (the
    * Common Crawl pre-extracted-text flavor) — the inverse of the ingest
    * path, so a graft-cleaned corpus can feed any WET-consuming tool.
    * One archive per `fileNo = hash-bucket of the id`, records in id
    * order; `text/plain` conversion payloads pass through [[readWarc]]
    * whole, so write→read is lossless (gate-verified).
    */
  def writeWet(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      uriCol: String,
      path: String,
      nFiles: Int,
      warcDate: String = "2026-01-01T00:00:00Z",
      gzip: Boolean = true): Unit = {
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    import spark.implicits._
    val out = docs.select(
      pmod(col(idCol), lit(nFiles)).cast("int").as("fileNo"),
      lit(gzip).as("gzip"),
      col(idCol).cast("long").as("seq"),
      lit("WARC/1.0").as("version"),
      lit("conversion").as("warcType"),
      concat(lit("<urn:uuid:wet-"), col(idCol), lit(">")).as("recordId"),
      col(uriCol).as("targetUri"),
      lit(warcDate).as("warcDate"),
      lit("text/plain").as("contentType"),
      encode(col(textCol), "UTF-8").as("payload"))
    writeWarc(out.as[OutRecord], path)
  }

  /** Decompress a (possibly multi-member) gzip stream fully. */
  private[sources] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    try {
      var r = in.read(buf)
      while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }

  private def startsWith(bytes: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > bytes.length) return false
    var i = 0
    while (i < s.length) { if (bytes(at + i) != s.charAt(i)) return false; i += 1 }
    true
  }

  /** Next offset of the ASCII needle at/after `from`, or -1. */
  private def indexOf(bytes: Array[Byte], needle: String, from: Int): Int = {
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= bytes.length) {
      if (startsWith(bytes, i, needle)) return i
      i += 1
    }
    -1
  }

  private def indexOfMagic(bytes: Array[Byte], from: Int): Int =
    indexOf(bytes, "WARC/1.", from)
}
