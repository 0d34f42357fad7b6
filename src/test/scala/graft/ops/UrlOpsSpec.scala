package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class UrlOpsSpec extends AnyFunSuite with SparkTestBase {

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(UrlOps.canonicalize(col("u"))).head().getString(0)
  }

  test("scheme and host lowercase; path and query case preserved") {
    assert(canon("HTTP://WWW.Example.COM/Path?Q=V") == "http://www.example.com/Path?Q=V")
  }

  test("default ports strip, non-default ports stay") {
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x")
    // :443 is NOT default for http
    assert(canon("http://a.com:443/x") == "http://a.com:443/x")
  }

  test("fragment drops; empty path becomes /") {
    assert(canon("http://a.com#frag") == "http://a.com/")
    assert(canon("http://a.com?x=1#frag") == "http://a.com/?x=1")
  }

  test("tracking params drop; the rest sort bytewise; emptied query loses its ?") {
    assert(canon("http://a.com/p?b=2&utm_source=x&a=1") == "http://a.com/p?a=1&b=2")
    assert(canon("http://a.com/p?gclid=z&fbclid=y&ref=h&msclkid=m") == "http://a.com/p")
    assert(canon("http://a.com/p?utm_campaign=c&utm_medium=m") == "http://a.com/p")
    // a param named utmost is NOT a utm_ prefix match
    assert(canon("http://a.com/p?utmost=1") == "http://a.com/p?utmost=1")
  }

  test("hostname strips any port") {
    import spark.implicits._
    val got = Seq("http://a.b.com:8080/x", "https://c.org/")
      .toDF("u").select(UrlOps.hostname(col("u"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("a.b.com", "c.org"))
  }

  private def reg(hosts: Seq[String], suffixes: Seq[String]): Map[String, Option[String]] = {
    import spark.implicits._
    UrlOps.registrableDomain(hosts.toDF("host"), "host", suffixes.toDF("suffix"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
  }

  test("registrable domain: longest suffix wins, exact-suffix hosts yield null") {
    val s = Seq("com", "uk", "co.uk", "github.io")
    val r = reg(Seq("a.b.example.co.uk", "x.example.com", "user.github.io",
      "co.uk", "github.io", "localhost"), s)
    assert(r("a.b.example.co.uk") == Some("example.co.uk")) // co.uk beats uk
    assert(r("x.example.com") == Some("example.com"))
    assert(r("user.github.io") == Some("user.github.io"))
    assert(r("co.uk").isEmpty) // the suffix itself registers nothing
    assert(r("github.io").isEmpty)
    assert(r("localhost").isEmpty) // single label, no fallback possible
  }

  test("unlisted hosts fall back to the last two labels (PSL default rule)") {
    val r = reg(Seq("deep.a.b.internal", "plain.lan"), Seq("com"))
    assert(r("deep.a.b.internal") == Some("b.internal"))
    assert(r("plain.lan") == Some("plain.lan"))
  }

  test("the suffix join is a broadcast (plan assertion)") {
    import spark.implicits._
    val df = UrlOps.registrableDomain(
      spark.range(100).select(concat(lit("h"), col("id"), lit(".example.com")).as("host")),
      "host", Seq("com").toDF("suffix"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
