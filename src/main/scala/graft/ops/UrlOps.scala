package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain (eTLD+1) extraction —
  * beyond-reference. Web curation keys almost everything by URL or domain:
  * exact-URL dedup across dumps wants one canonical spelling, and domain
  * quotas / link-graph nodes / per-site quality priors all want the
  * REGISTRABLE domain (`foo.co.uk`, not `co.uk` or `a.b.foo.co.uk`).
  *
  * Everything here is a `functions._` composition (codegen'd, no UDFs) on
  * the RE2∩Java-identical regex subset (the [[graft.text.Pii]] discipline),
  * so the DuckDB oracle replays it literally. Spark's `parse_url` is
  * avoided on purpose: it has no DuckDB counterpart, so using it would put
  * an unverifiable step in the chain.
  *
  * Canonicalization semantics (deterministic, spec-pinned):
  *   - scheme and host lowercase;
  *   - default ports stripped (`:80` for http, `:443` for https; any other
  *     port kept);
  *   - fragment dropped;
  *   - tracking params dropped (name in [[TRACKING_PARAMS]] or prefixed
  *     `utm_`), the rest SORTED bytewise and rejoined — param order is
  *     presentation, not identity; an emptied query drops its `?`;
  *   - empty path becomes `/`;
  *   - dot-segment resolution is NOT attempted (rare in crawl URLs,
  *     ambiguous without a base — documented divergence from RFC 3986).
  *
  * The public-suffix list is DATA, not code: [[registrableDomain]] takes a
  * suffix frame (the PSL, or any subset) and broadcast-joins the host's
  * candidate suffixes against it — longest match wins, unmatched hosts
  * fall back to the PSL default `*` rule (last two labels).
  */
object UrlOps {

  val TRACKING_PARAMS: Seq[String] = Seq("gclid", "fbclid", "msclkid", "ref")

  private val SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QUERY_RE = "\\?([^#]*)"

  def scheme(url: Column): Column = lower(regexp_extract(url, SCHEME_RE, 1))

  private def hostport(url: Column): Column = lower(regexp_extract(url, HOSTPORT_RE, 1))

  /** Host, lowercased, default port stripped (non-default ports KEPT). */
  def host(url: Column): Column = {
    val sch = scheme(url)
    val hp = hostport(url)
    when(sch === "http", regexp_replace(hp, ":80$", ""))
      .when(sch === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
  }

  /** Host without any port — the domain-keyed operators' input. */
  def hostname(url: Column): Column = regexp_replace(host(url), ":\\d+$", "")

  /** Canonical URL per the semantics above. */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val hp = host(url)
    val rawPath = regexp_extract(url, PATH_RE, 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val rawQuery = regexp_extract(url, QUERY_RE, 1)
    val kept = filter(
      split(rawQuery, "&"),
      p => {
        val name = split(p, "=").getItem(0)
        !name.startsWith("utm_") && !name.isin(TRACKING_PARAMS: _*) && p =!= ""
      })
    val sortedQ = array_join(array_sort(kept), "&")
    concat(sch, lit("://"), hp, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /** eTLD+1 per a suffix frame with one string column `suffix`. For host
    * `l1.l2.….lk`, candidate suffixes `li+1.….lk` (i ≥ 1) join against the
    * frame; the LONGEST match wins and the registrable domain is
    * `li.<suffix>`. Hosts matching nothing fall back to the last two
    * labels; hosts that ARE a public suffix (or a single label) yield
    * null. The suffix frame is broadcast — the PSL is ~10k rows, a
    * classic small-dim join.
    */
  def registrableDomain(df: DataFrame, hostCol: String, suffixes: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val labels = split(col(hostCol), "\\.")
    val k = size(labels)
    // candidate i = start label (1-based) of the suffix; suffix has k-i
    // labels, so the registrable domain is label i prepended to it
    val cands = df
      .withColumn("__labels", labels)
      .withColumn("__k", k)
      .withColumn("__i", explode(sequence(lit(2), greatest(col("__k"), lit(2)))))
      .filter(col("__i") <= col("__k"))
      .withColumn("__cand",
        array_join(slice(col("__labels"), col("__i"), col("__k") - col("__i") + 1), "."))
    val matched = cands
      .join(broadcast(suffixes.select(col("suffix").as("__cand"))), Seq("__cand"))
      .groupBy(col(hostCol))
      // longest suffix = smallest start index
      .agg(min(col("__i")).as("__best"))
    // a host that IS a listed suffix has no registrable domain (PSL rule)
    val isSuffix = broadcast(suffixes.select(col("suffix").as(hostCol))
      .withColumn("__is_suffix", lit(true)))
    df.join(matched, Seq(hostCol), "left")
      .join(isSuffix, Seq(hostCol), "left")
      .withColumn("registrable_domain",
        when(col("__is_suffix").isNotNull, lit(null))
          .when(col("__best").isNotNull,
            array_join(slice(split(col(hostCol), "\\."), col("__best") - 1,
              size(split(col(hostCol), "\\.")) - col("__best") + 2), "."))
          .when(size(split(col(hostCol), "\\.")) >= 2,
            array_join(slice(split(col(hostCol), "\\."), -2, 2), "."))
          .otherwise(lit(null)))
      .drop("__best", "__is_suffix")
  }
}
