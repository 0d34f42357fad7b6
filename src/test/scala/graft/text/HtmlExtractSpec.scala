package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class HtmlExtractSpec extends AnyFunSuite with SparkTestBase {

  private def ext(s: String): String = HtmlExtract.extractText(s)

  test("plain text passes through") {
    assert(ext("hello world") == "hello world")
  }

  test("inline tags vanish, block tags break lines") {
    assert(ext("<p>one <b>two</b> three</p><p>four</p>") == "one two three\nfour")
    assert(ext("line<br>break") == "line\nbreak")
    assert(ext("<ul><li>a</li><li>b</li></ul>") == "a\nb")
    assert(ext("<h1>t</h1>body") == "t\nbody")
  }

  test("script and style content is dropped whole, including markup-like text") {
    assert(ext("""a<script>if (1 < 2) { alert("</b>nope"); }</script>b""") == "ab")
    assert(ext("a<style>p { color: red; } /* > */</style>b") == "ab")
    // case-insensitive close tag
    assert(ext("a<SCRIPT>x<y</ScRiPt>b") == "ab")
    // unterminated raw-text element swallows the rest (spec'd behavior)
    assert(ext("a<script>var x = 1;") == "a")
  }

  test("comments, CDATA, doctype, and processing instructions are dropped") {
    assert(ext("a<!-- <p>not text</p> -->b") == "ab")
    assert(ext("a<![CDATA[ <p>raw</p> ]]>b") == "ab")
    assert(ext("<!doctype html>a<?php echo 1; ?>b") == "ab")
  }

  test("character references decode; malformed ones pass through literally") {
    assert(ext("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") == "a & b <c> \"d\" 'e'")
    assert(ext("He&#97;ding &#x6F;k") == "Heading ok")
    assert(ext("nb&nbsp;sp") == "nb sp")
    // astral-plane codepoint
    assert(ext("&#x1F600;") == new String(Character.toChars(0x1F600)))
    // malformed: unknown name, no semicolon nearby, bad digits, zero
    assert(ext("a &bogus; b") == "a &bogus; b")
    assert(ext("5 & 6") == "5 & 6")
    assert(ext("&#xZZ;") == "&#xZZ;")
    assert(ext("&#0;x") == "&#0;x")
    // surrogate code points are malformed — appendCodePoint would emit an
    // unpaired surrogate whose UTF-8 bytes are replacement-dependent
    assert(ext("&#xD800;x") == "&#xD800;x")
    assert(ext("&#xDFFF;") == "&#xDFFF;")
    assert(ext("&#55296;") == "&#55296;") // decimal form of 0xD800
  }

  test("anchor extraction pairs href with rendered inner text") {
    def anchors(s: String): Seq[(String, String)] =
      HtmlExtract.extractAnchors(s).toSeq.map { a =>
        val t = a.split("\t", -1); (t(0), t.lift(1).getOrElse(""))
      }
    // inner markup strips, entities decode, whitespace folds
    assert(anchors("""x<a href="http://h/p">visit <b>here</b>&nbsp;now</a>y""") ==
      Seq(("http://h/p", "visit here now")))
    // no-href anchors are skipped; empty-text anchors keep an empty text
    assert(anchors("""<a name="x">skip</a><a href='u'></a>""") == Seq(("u", "")))
    // unquoted href, case-insensitive close tag, document order
    assert(anchors("""<a href=/a1>one</a><A HREF="/a2">two</A>""") ==
      Seq(("/a1", "one"), ("/a2", "two")))
    // unterminated anchor runs to end of document; newlines flatten
    assert(anchors("<a href=\"z\">line1<p>line2") == Seq(("z", "line1 line2")))
  }

  test("whitespace folds per line; empty lines drop") {
    assert(ext("<p>  a   b  </p>\n\n<p>\t c </p>") == "a b\nc")
    assert(ext("<div></div><div>  </div><div>x</div>") == "x")
  }

  test("quoted '>' inside attributes does not end the tag") {
    assert(ext("""<a href="x>y">link</a>""") == "link")
    assert(ext("""<img alt='a>b'>pic""") == "pic")
  }

  test("bare '<' that opens no tag is literal text") {
    assert(ext("1 < 2") == "1 < 2")
  }

  test("noindex detection: forms, case, and absence") {
    assert(HtmlExtract.hasNoindex("""<meta name="robots" content="noindex,nofollow">"""))
    assert(HtmlExtract.hasNoindex("""<META NAME='ROBOTS' CONTENT='NOINDEX'>"""))
    assert(HtmlExtract.hasNoindex("""<meta name=robots content=noindex>"""))
    assert(!HtmlExtract.hasNoindex("""<meta name="robots" content="index,follow">"""))
    assert(!HtmlExtract.hasNoindex("""<meta name="viewport" content="noindex">"""))
    assert(!HtmlExtract.hasNoindex("""<p>noindex robots</p>"""))
    // meta prefix must be a whole tag name, not e.g. <metadata>
    assert(!HtmlExtract.hasNoindex("""<metadata name="robots" content="noindex"></metadata>"""))
  }

  test("expressions run inside whole-stage codegen") {
    HtmlExtract.register(spark)
    // range-backed so ConvertToLocalRelation can't pre-fold the expressions
    // out of the executed plan
    val df = spark.range(2)
      .select(when(col("id") === 1, lit(null))
        .otherwise(concat(lit("<p>a &amp; b"), col("id"), lit("</p>"))).as("h"))
      .select(HtmlExtract.htmlToText(col("h")).as("t"),
        HtmlExtract.htmlNoindex(col("h")).as("ni"))
    val rows = df.collect()
    assert(rows.map(r => Option(r.getString(0))).toSet == Set(Some("a & b0"), None))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no WholeStageCodegen stage in:\n$plan")
  }

  test("SQL registration works") {
    HtmlExtract.register(spark)
    val r = spark.sql("SELECT graft_html_text('<p>x</p>') AS t, graft_html_noindex('<p>x</p>') AS n")
      .head()
    assert(r.getString(0) == "x" && !r.getBoolean(1))
  }
}
