package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (REP, RFC 9309) — the fetch-level politeness rule
  * that pairs with the robots-meta noindex cut: a crawl-derived corpus
  * drops pages the site told crawlers not to fetch. Beyond-reference.
  *
  * Implemented REP subset (documented, spec-pinned):
  *   - `User-agent` groups; the MOST SPECIFIC group wins wholesale — if any
  *     group names our agent (case-insensitive token match), `*` groups are
  *     ignored entirely (RFC 9309 §2.2.1);
  *   - `Allow`/`Disallow` path rules with `*` wildcards and the `$`
  *     end-anchor; an empty `Disallow:` value is a no-op line;
  *   - longest-pattern-match wins (octet length of the pattern); on a
  *     length tie ALLOW wins (§2.2.2);
  *   - no matching rule (or no applicable group, or empty/absent
  *     robots.txt) ⇒ allowed;
  *   - `Crawl-delay`/`Sitemap`/unknown lines ignored; `#` comments strip.
  *
  * Shape: [[RobotsAllowed]] is a ternary codegen expression
  * `(robots_txt, user_agent LITERAL, path)` → boolean, so the per-domain
  * robots frame joins pages on domain (a co-shuffled dim join — the
  * robots axis is ~|domains|, far too big to broadcast at web scale but
  * exactly the join AQE handles) and the verdict is row-local from there.
  * The agent resolves at PLAN time; parsed rule lists are memoized per
  * robots body in a bounded per-JVM cache, so a domain's rules parse once
  * per executor, not once per page.
  */
object RobotsTxt {

  /** One rule: allow?, raw pattern, compiled regex, and its RFC 9309
    * §2.2.2 specificity — the UTF-8 OCTET length of the path pattern with
    * the trailing `$` anchor excluded (char count would mis-rank non-ASCII
    * patterns and count the anchor, which matches no octets).
    */
  final case class Rule(allow: Boolean, pattern: String, re: java.util.regex.Pattern, spec: Int)

  private def specificity(pattern: String): Int = {
    val body = if (pattern.endsWith("$")) pattern.dropRight(1) else pattern
    body.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[(String, String), Array[Rule]]()
  private val CACHE_MAX = 4096

  /** Parse the applicable rule list for `agent` (most-specific group
    * selection). Memoized; eval-path entry point.
    */
  def rulesFor(robots: String, agent: String): Array[Rule] = {
    val key = (robots, agent)
    val hit = cache.get(key)
    if (hit != null) return hit
    val parsed = parse(robots, agent)
    if (cache.size < CACHE_MAX) cache.put(key, parsed)
    parsed
  }

  private def parse(robots: String, agent: String): Array[Rule] = {
    val agentLc = agent.toLowerCase
    // (isExactGroup, rules) per group
    val exact = scala.collection.mutable.ArrayBuffer.empty[Rule]
    val star = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var groupAgents = Set.empty[String]
    var inHeader = false // consecutive user-agent lines accumulate one group
    robots.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim.stripSuffix("\r")
      val k = line.indexOf(':')
      if (k > 0) {
        val key = line.substring(0, k).trim.toLowerCase
        val value = line.substring(k + 1).trim
        key match {
          case "user-agent" =>
            if (!inHeader) groupAgents = Set.empty
            inHeader = true
            groupAgents += value.toLowerCase
          case "allow" | "disallow" =>
            inHeader = false
            if (value.nonEmpty) {
              val r = Rule(key == "allow", value, compile(value), specificity(value))
              if (groupAgents.contains(agentLc)) exact += r
              else if (groupAgents.contains("*")) star += r
            }
          case _ => inHeader = false
        }
      }
    }
    (if (exact.nonEmpty) exact else star).toArray
  }

  /** REP pattern → anchored regex: `*` → `.*`, trailing `$` stays an
    * anchor, everything else is literal; the match is a PREFIX match
    * unless `$`-anchored.
    */
  private def compile(pattern: String): java.util.regex.Pattern = {
    val sb = new StringBuilder("^")
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()<>+-=!?^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$')
    java.util.regex.Pattern.compile(sb.toString)
  }

  /** The verdict for one path: longest matching pattern wins, allow wins
    * ties, no match ⇒ allowed. Codegen-callable; an EMPTY robots body
    * (how callers encode "site has no robots.txt" — coalesce the join
    * miss to '') has no rules and allows everything.
    */
  def allowed(robots: UTF8String, agent: String, path: UTF8String): Boolean = {
    val rs = rulesFor(robots.toString, agent)
    val p = path.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rs.length) {
      val r = rs(i)
      if (r.re.matcher(p).lookingAt()) {
        val len = r.spec
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
      i += 1
    }
    bestAllow
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_robots_allowed",
      exprs => RobotsAllowed(exprs.head, exprs(1), exprs(2)), "built-in")

  def robotsAllowed(robots: Column, agent: String, path: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_robots_allowed",
      robots, org.apache.spark.sql.functions.lit(agent), path)
}

/** `graft_robots_allowed(robots_txt, agent, path)` — agent must be a
  * foldable literal (resolved at plan time). Standard null propagation:
  * encode "site has no robots.txt" as an EMPTY robots body (coalesce the
  * domain-join miss to ''), which has no rules and allows everything.
  */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType || third.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("robots and path must be strings")
    else if (second.dataType != StringType || !second.foldable)
      TypeCheckResult.TypeCheckFailure("agent must be a foldable string literal")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val agent: String = second.eval().asInstanceOf[UTF8String].toString

  override def nullSafeEval(r: Any, a: Any, p: Any): Any =
    RobotsTxt.allowed(r.asInstanceOf[UTF8String], agent, p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("agent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (r, _, p) =>
      s"${ev.value} = graft.text.RobotsTxt.allowed($r, $agentRef, $p);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RobotsAllowed =
    copy(first = f, second = s, third = t)
}
