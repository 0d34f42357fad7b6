package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction (the C4/CCNet crawl-ingest step) as native
  * Catalyst expressions — beyond-reference.
  *
  * Every web-scale corpus starts life as HTML inside WARC records; the
  * first operator it meets is "strip the markup, keep the prose". The
  * production tools (C4's extractor, trafilatura, resiliparse) are
  * per-document pure functions — exactly the shape that belongs in a
  * codegen'd expression rather than a UDF: one pass over the bytes, no
  * allocation beyond the output buffer, and the scan → extract → filter
  * chain stays inside one WholeStageCodegen span.
  *
  * Extraction semantics (deterministic, documented, spec-pinned):
  *   - `<script>`/`<style>` elements are dropped whole (raw-text scan to
  *     the matching close tag, case-insensitive — their content is NOT
  *     markup, so `<` inside them must not open tags);
  *   - comments `<!-- -->`, CDATA, `<!doctype>`, and `<? ?>` are dropped;
  *   - block-level tags (p, div, br, li, ul, ol, h1–h6, table, tr, title,
  *     section, article, header, footer, blockquote, pre, hr, td, th)
  *     emit a line break on BOTH open and close; inline tags vanish;
  *   - character references decode: the XML named five + nbsp, and
  *     numeric `&#d;` / `&#xh;` (full codepoint range via
  *     appendCodePoint); malformed references pass through literally;
  *   - whitespace folds per line (runs → one space, trim), empty lines
  *     drop, lines join with '\n' — the same fold `Normalize.foldKey`
  *     applies, so extracted text enters the dedup/quality operators in
  *     canonical form.
  *
  * [[HtmlNoindex]] reads the robots meta tag (`<meta name="robots"
  * content="...noindex...">`) — the C4 politeness rule: pages that ask to
  * stay out of indexes stay out of the corpus.
  */
object HtmlExtract {

  private val BLOCK = Set(
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "tr", "td", "th", "title", "section", "article", "header",
    "footer", "blockquote", "pre", "hr")

  /** One-pass tag/entity state machine. Static and pure so generated code
    * can call it directly (the same pattern as `java.text.Normalizer` in
    * [[graft.functions.UnicodeNormalize]]).
    */
  def extractText(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n / 2)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.regionMatches(true, i, "<![CDATA[", 0, 9)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          val nameStart = if (closing) i + 2 else i + 1
          var j = nameStart
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          if (name.isEmpty) { out.append(c); i += 1 } // bare '<' is text
          else {
            val tagEnd = skipToTagEnd(html, j)
            if (!closing && (name == "script" || name == "style")) {
              // raw-text element: content is not markup; scan for the
              // case-insensitive close tag
              val close = indexOfIgnoreCase(html, "</" + name, tagEnd)
              if (close < 0) i = n
              else {
                val e = html.indexOf('>', close)
                i = if (e < 0) n else e + 1
              }
            } else {
              if (BLOCK.contains(name)) out.append('\n')
              i = tagEnd
            }
          }
        }
      } else if (c == '&') {
        i = appendEntity(html, i, out)
      } else {
        out.append(c)
        i += 1
      }
    }
    foldLines(out.toString)
  }

  /** True iff a `<meta name="robots" content="...">` tag's content lists
    * noindex (case-insensitive on name, value, and the directive).
    */
  def hasNoindex(html: String): Boolean = {
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return false
      if (html.regionMatches(true, lt, "<meta", 0, 5) &&
          (lt + 5 >= n || !Character.isLetterOrDigit(html.charAt(lt + 5)))) {
        val tagEnd = skipToTagEnd(html, lt + 5)
        val tag = html.substring(lt, math.min(tagEnd, n)).toLowerCase
        if (attrValue(tag, "name").exists(_.trim == "robots") &&
            attrValue(tag, "content").exists(_.contains("noindex"))) return true
        i = tagEnd
      } else i = lt + 1
    }
    false
  }

  /** All anchor hrefs in document order (the link-graph edge source). The
    * attribute VALUE keeps its original case (URLs are case-sensitive past
    * the host); only the tag/attr names match case-insensitively.
    */
  def extractLinks(html: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return out.toArray
      if (lt + 2 <= n && (html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A') &&
          (lt + 2 == n || !Character.isLetterOrDigit(html.charAt(lt + 2)))) {
        val tagEnd = skipToTagEnd(html, lt + 2)
        val tag = html.substring(lt, math.min(tagEnd, n))
        attrValueRaw(tag, "href").foreach(out += _)
        i = tagEnd
      } else i = lt + 1
    }
    out.toArray
  }

  /** Anchors with their text: one `"href\ttext"` entry per `<a>` tag
    * carrying an href, in document order — the anchor-TEXT relevance
    * signal the bare link graph lacks (what the web calls the target,
    * not what the target calls itself). The text is the [[extractText]]
    * rendering of the anchor's inner HTML (inner tags stripped, entities
    * decoded, whitespace folded) with newlines flattened to spaces; it
    * runs to the next case-insensitive `</a` (HTML forbids nested
    * anchors) or end of document. The tab separator is safe: `\t` is
    * whitespace, so extractText can never emit one.
    */
  def extractAnchors(html: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return out.toArray
      if (lt + 2 <= n && (html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A') &&
          (lt + 2 == n || !Character.isLetterOrDigit(html.charAt(lt + 2)))) {
        val tagEnd = skipToTagEnd(html, lt + 2)
        val tag = html.substring(lt, math.min(tagEnd, n))
        attrValueRaw(tag, "href") match {
          case Some(href) =>
            val close = indexOfIgnoreCase(html, "</a", math.min(tagEnd, n))
            val end = if (close < 0) n else close
            val text = extractText(html.substring(math.min(tagEnd, n), end))
              .replace('\n', ' ')
            out += (href + "\t" + text)
            i = if (close < 0) n else close + 1
          case None => i = tagEnd
        }
      } else i = lt + 1
    }
    out.toArray
  }

  def anchorsArray(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      extractAnchors(html.toString).map(UTF8String.fromString).asInstanceOf[Array[Any]])

  /** Case-preserving variant: the attr NAME matches case-insensitively but
    * the returned value keeps its original case (needed for hrefs).
    */
  private def attrValueRaw(tag: String, attr: String): Option[String] = {
    val lower = tag.toLowerCase
    var from = 0
    while (true) {
      val k = lower.indexOf(attr, from)
      if (k < 0) return None
      val before = if (k == 0) ' ' else lower.charAt(k - 1)
      var j = k + attr.length
      while (j < tag.length && Character.isWhitespace(tag.charAt(j))) j += 1
      if (Character.isWhitespace(before) || before == ' ') {
        if (j < tag.length && tag.charAt(j) == '=') {
          j += 1
          while (j < tag.length && Character.isWhitespace(tag.charAt(j))) j += 1
          if (j < tag.length && (tag.charAt(j) == '"' || tag.charAt(j) == '\'')) {
            val q = tag.charAt(j)
            val e = tag.indexOf(q, j + 1)
            return Some(tag.substring(j + 1, if (e < 0) tag.length else e))
          }
          // HTML5: unquoted values end at whitespace or '>' ONLY — '/' is
          // part of the value (matters for unquoted URLs)
          var e = j
          while (e < tag.length && !Character.isWhitespace(tag.charAt(e)) &&
            tag.charAt(e) != '>') e += 1
          return Some(tag.substring(j, e))
        }
      }
      from = k + 1
    }
    None // unreachable
  }

  /** Attribute value from an already-lowercased raw tag string; handles
    * single/double/unquoted forms.
    */
  private def attrValue(tag: String, attr: String): Option[String] = {
    var from = 0
    while (true) {
      val k = tag.indexOf(attr, from)
      if (k < 0) return None
      val before = if (k == 0) ' ' else tag.charAt(k - 1)
      var j = k + attr.length
      while (j < tag.length && Character.isWhitespace(tag.charAt(j))) j += 1
      if ((before == ' ' || Character.isWhitespace(before)) &&
          j < tag.length && tag.charAt(j) == '=') {
        j += 1
        while (j < tag.length && Character.isWhitespace(tag.charAt(j))) j += 1
        if (j < tag.length && (tag.charAt(j) == '"' || tag.charAt(j) == '\'')) {
          val q = tag.charAt(j)
          val e = tag.indexOf(q, j + 1)
          return Some(tag.substring(j + 1, if (e < 0) tag.length else e))
        }
        var e = j
        while (e < tag.length && !Character.isWhitespace(tag.charAt(e)) &&
          tag.charAt(e) != '>') e += 1
        return Some(tag.substring(j, e))
      }
      from = k + 1
    }
    None // unreachable
  }

  /** Past the closing '>' of a tag whose name ends at `from`, respecting
    * quoted attribute values (a '>' inside quotes does not end the tag).
    */
  private def skipToTagEnd(html: String, from: Int): Int = {
    val n = html.length
    var i = from
    var quote: Char = 0
    while (i < n) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    n
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length; val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }

  /** Decode one character reference starting at `i` ('&'); append the
    * decoded char(s) (or the literal text when malformed) and return the
    * next index.
    */
  private def appendEntity(html: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = html.length
    val semi = html.indexOf(';', i + 1)
    // references are short; a distant/missing ';' means a literal '&'
    if (semi < 0 || semi - i > 12) { out.append('&'); return i + 1 }
    val body = html.substring(i + 1, semi)
    body match {
      case "amp" => out.append('&')
      case "lt" => out.append('<')
      case "gt" => out.append('>')
      case "quot" => out.append('"')
      case "apos" => out.append('\'')
      case "nbsp" => out.append(' ')
      case _ if body.length > 1 && body.charAt(0) == '#' =>
        val hex = body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
        val digits = if (hex) body.substring(2) else body.substring(1)
        try {
          val cp = Integer.parseInt(digits, if (hex) 16 else 10)
          // surrogate code points (0xD800-0xDFFF) are "valid" to
          // isValidCodePoint but appendCodePoint would emit an unpaired
          // surrogate — an ill-formed string whose UTF-8 bytes are
          // replacement-dependent; treat them as malformed (literal '&')
          if (Character.isValidCodePoint(cp) && cp > 0 && !(cp >= 0xD800 && cp <= 0xDFFF))
            out.appendCodePoint(cp)
          else { out.append('&'); return i + 1 }
        } catch {
          case _: NumberFormatException => out.append('&'); return i + 1
        }
      case _ => out.append('&'); return i + 1
    }
    semi + 1
  }

  /** Per-line whitespace fold, drop empties, join with '\n'. */
  private def foldLines(raw: String): String = {
    val out = new java.lang.StringBuilder(raw.length)
    val line = new java.lang.StringBuilder(128)
    var i = 0
    val n = raw.length
    def flush(): Unit = {
      // trailing space from the fold, if any
      val l = line.length
      val end = if (l > 0 && line.charAt(l - 1) == ' ') l - 1 else l
      if (end > 0) {
        if (out.length > 0) out.append('\n')
        out.append(line, 0, end)
      }
      line.setLength(0)
    }
    var pendingSpace = false
    while (i < n) {
      val c = raw.charAt(i)
      if (c == '\n') { flush(); pendingSpace = false }
      else if (Character.isWhitespace(c)) { if (line.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { line.append(' '); pendingSpace = false }
        line.append(c)
      }
      i += 1
    }
    flush()
    out.toString
  }

  /** Codegen-callable bridge: UTF8String html → Catalyst string array. */
  def linksArray(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      extractLinks(html.toString).map(UTF8String.fromString).asInstanceOf[Array[Any]])

  /** Register `graft_html_text` / `graft_html_noindex` / `graft_html_links`
    * (idempotent).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_html_text", exprs => HtmlToText(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_html_noindex", exprs => HtmlNoindex(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_html_links", exprs => HtmlLinks(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_html_anchors", exprs => HtmlAnchors(exprs.head), "built-in")
  }

  def htmlToText(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_html_text", c)

  def htmlNoindex(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_html_noindex", c)

  def htmlLinks(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_html_links", c)

  def htmlAnchors(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_html_anchors", c)
}

/** `graft_html_text(html)` — see [[HtmlExtract.extractText]]. */
case class HtmlToText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(h: Any): Any =
    UTF8String.fromString(HtmlExtract.extractText(h.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
       |  graft.text.HtmlExtract.extractText($a.toString()));
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): HtmlToText = copy(child = c)
}

/** `graft_html_links(html)` — anchor hrefs in document order; see
  * [[HtmlExtract.extractLinks]].
  */
case class HtmlLinks(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(h: Any): Any =
    HtmlExtract.linksArray(h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.text.HtmlExtract.linksArray($a);")

  override protected def withNewChildInternal(c: Expression): HtmlLinks = copy(child = c)
}

/** `graft_html_anchors(html)` — `"href\ttext"` pairs in document order;
  * see [[HtmlExtract.extractAnchors]].
  */
case class HtmlAnchors(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(h: Any): Any =
    HtmlExtract.anchorsArray(h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.text.HtmlExtract.anchorsArray($a);")

  override protected def withNewChildInternal(c: Expression): HtmlAnchors = copy(child = c)
}

/** `graft_html_noindex(html)` — see [[HtmlExtract.hasNoindex]]. */
case class HtmlNoindex(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(h: Any): Any =
    HtmlExtract.hasNoindex(h.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.text.HtmlExtract.hasNoindex($a.toString());")

  override protected def withNewChildInternal(c: Expression): HtmlNoindex = copy(child = c)
}
