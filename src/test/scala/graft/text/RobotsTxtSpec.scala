package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RobotsTxtSpec extends AnyFunSuite with SparkTestBase {

  private def ok(robots: String, path: String, agent: String = "graftbot"): Boolean =
    RobotsTxt.allowed(UTF8String.fromString(robots), agent, UTF8String.fromString(path))

  test("prefix disallow, unrelated paths untouched, empty robots allows") {
    val r = "User-agent: *\nDisallow: /admin/\n"
    assert(!ok(r, "/admin/x"))
    assert(ok(r, "/public/x"))
    assert(ok("", "/anything"))
  }

  test("exact-agent group eclipses the star group wholesale (RFC 9309 2.2.1)") {
    val r = "User-agent: graftbot\nDisallow: /p/\nUser-agent: *\nDisallow: /\n"
    assert(!ok(r, "/p/1"))
    assert(ok(r, "/q/1")) // the star group's Disallow: / does NOT apply
    assert(!ok(r, "/q/1", agent = "elsebot")) // other agents get the star group
  }

  test("longest match wins; allow beats disallow on a length tie") {
    val r = "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
    assert(!ok(r, "/private/x"))
    assert(ok(r, "/private/ok-page")) // allow is longer
    val tie = "User-agent: *\nDisallow: /dir/\nAllow: /dir*\n" // both length 5
    assert(ok(tie, "/dir/page"))
  }

  test("* wildcards and the $ end anchor") {
    val r = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/log\n"
    assert(!ok(r, "/docs/file.pdf"))
    assert(ok(r, "/docs/file.pdf.html")) // $ anchors the end
    assert(!ok(r, "/tmp123/log"))
    // prefix semantics: the pattern matches any path whose head it matches
    assert(!ok(r, "/tmp123/logs-are-fine"))
  }

  test("specificity is octet length with the $ anchor excluded (RFC 9309 2.2.2)") {
    // '$' matches no octets: Allow '/a$' has specificity 2, Disallow '/a*'
    // has 3 — under raw char count both would be 3 and the tie would allow
    val anchored = "User-agent: *\nAllow: /a$\nDisallow: /a*\n"
    assert(!ok(anchored, "/a"))
    // non-ASCII octets count: Allow '/é' is 3 OCTETS (2 chars), tying the
    // 3-octet Disallow '/*a' — allow wins the tie; char count would say
    // 2 < 3 and wrongly disallow
    val utf8 = "User-agent: *\nAllow: /é\nDisallow: /*a\n"
    assert(ok(utf8, "/éa"))
  }

  test("comments strip, empty Disallow is a no-op, unknown keys ignored") {
    val r = "User-agent: * # everyone\nDisallow: # nothing blocked\nCrawl-delay: 10\nSitemap: http://x/s.xml\n"
    assert(ok(r, "/anything"))
  }

  test("rules outside any group are ignored; group for another agent only") {
    assert(ok("Disallow: /\n", "/x")) // no group header
    assert(ok("User-agent: otherbot\nDisallow: /\n", "/x"))
  }

  test("multiple consecutive user-agent lines share one group") {
    val r = "User-agent: abot\nUser-agent: graftbot\nDisallow: /both/\n"
    assert(!ok(r, "/both/x"))
    assert(!ok(r, "/both/x", agent = "abot"))
    assert(ok(r, "/both/x", agent = "cbot"))
  }

  test("regex metacharacters in patterns are literal") {
    val r = "User-agent: *\nDisallow: /a+b(c)/\n"
    assert(!ok(r, "/a+b(c)/x"))
    assert(ok(r, "/aab/x"))
  }

  test("expression runs in codegen through a domain join") {
    RobotsTxt.register(spark)
    val sp = spark
    import sp.implicits._
    val pages = spark.range(4).select(
      (col("id") % 2).cast("string").as("domain"),
      concat(lit("/p/"), col("id")).as("path"))
    val robots = Seq(("0", "User-agent: *\nDisallow: /p/\n"), ("1", ""))
      .toDF("domain", "robots_txt")
    val out = pages.join(robots, "domain")
      .select(col("path"), RobotsTxt.robotsAllowed(
        coalesce(col("robots_txt"), lit("")), "graftbot", col("path")).as("allowed"))
    val got = out.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("/p/0" -> false, "/p/2" -> false, "/p/1" -> true, "/p/3" -> true))
    assert(out.queryExecution.executedPlan.toString.contains("*("))
  }
}
