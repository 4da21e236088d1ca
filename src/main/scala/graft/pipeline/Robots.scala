package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt crawl policy (REP, RFC 9309) — the filter every crawl
  * frontier passes before fetching. Google's published REP semantics:
  * group selection by most-specific matching user-agent, longest-match
  * rule wins between Allow and Disallow, Allow wins a length tie, empty
  * Disallow means allow-all, `*` wildcards and `$` end-anchors supported.
  *
  * Rule sets are HOST-scale (thousands of lines at most), so the compiled
  * policy rides a BROADCAST into the frontier filter — the frontier stream
  * itself never shuffles: `allowedCol` is a deterministic per-row kernel
  * applied as a typed filter.
  */
object Robots {

  /** One compiled rule: allow/disallow + the path pattern split into
    * literal segments between `*` wildcards, plus an optional `$` anchor. */
  final case class Rule(allow: Boolean, pattern: String) {
    val anchored: Boolean = pattern.endsWith("$")
    private val body = if (anchored) pattern.dropRight(1) else pattern
    private val segs = body.split("\\*", -1)

    /** RFC 9309 match: pattern is a prefix-match with `*` spanning any
      * run (including empty) and `$` pinning the end. */
    def matches(path: String): Boolean = {
      if (segs.length == 1)
        return if (anchored) path == body else path.startsWith(body)
      if (!path.startsWith(segs.head)) return false
      var pos = segs.head.length
      var i = 1
      while (i < segs.length - 1) {
        val at = path.indexOf(segs(i), pos)
        if (at < 0) return false
        pos = at + segs(i).length
        i += 1
      }
      val last = segs.last
      if (anchored) path.length >= pos + last.length && path.endsWith(last)
      else last.isEmpty || path.indexOf(last, pos) >= 0
    }

    /** longest-match precedence counts pattern length (RFC 9309 §2.2.2). */
    def specificity: Int = pattern.length
  }

  /** One parsed group: its agent names, rules, and (non-standard but
    * widely honored) Crawl-delay in seconds. */
  final case class Group(agents: Seq[String], rules: Seq[Rule],
                         crawlDelay: Option[Double])

  /** All groups of a robots.txt body, in order. */
  def parseGroups(txt: String): Seq[Group] = {
    val groups = scala.collection.mutable.Buffer.empty[Group]
    var agents = Seq.empty[String]
    var rules = Seq.empty[Rule]
    var delay: Option[Double] = None
    var inAgents = true
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Seq.empty; rules = Seq.empty; delay = None
    }
    txt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val k = line.substring(0, i).trim.toLowerCase
        val v = line.substring(i + 1).trim
        k match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents :+= v.toLowerCase; inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            // empty Disallow = allow everything (match nothing)
            if (v.nonEmpty) rules :+= Rule(allow = k == "allow", pattern = v)
          case "crawl-delay" =>
            inAgents = false
            // malformed values ignored, never a parse failure
            delay = delay.orElse(v.toDoubleOption.filter(_ >= 0))
          case _ => inAgents = false // sitemap etc.: group-neutral, ignored here
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** Most specific matching group for `agent`: exact name beats `*`,
    * groups do not merge — RFC 9309 §2.2.1. */
  private def chooseGroup(txt: String, agent: String): Group = {
    val groups = parseGroups(txt)
    val a = agent.toLowerCase
    val exact = groups.filter(_.agents.exists(g => g != "*" && a.contains(g)))
    if (exact.nonEmpty)
      exact.maxBy(_.agents.filter(g => a.contains(g)).map(_.length).max)
    else groups.find(_.agents.contains("*")).getOrElse(Group(Nil, Nil, None))
  }

  /** Parse a robots.txt body for ONE user agent (exact-name group match
    * with `*` fallback, case-insensitive per spec; the most specific
    * matching group wins and groups do not merge — RFC 9309 §2.2.1). */
  def parse(txt: String, agent: String): Seq[Rule] = chooseGroup(txt, agent).rules

  /** The chosen group's Crawl-delay for `agent` (seconds) — the per-host
    * politeness override a fetch scheduler spaces requests by. Group
    * selection identical to [[parse]]; None when the group sets none. */
  def crawlDelay(txt: String, agent: String): Option[Double] =
    chooseGroup(txt, agent).crawlDelay

  /** `Sitemap:` directives (sitemaps.org discovery) — GLOBAL lines, not
    * group-scoped, so they apply to every agent; order preserved,
    * duplicates kept (several sitemaps are legal). The natural feed for
    * `Sitemaps.indexChildren`/`entries`. */
  def sitemapUrls(txt: String): Seq[String] =
    txt.linesIterator.map(_.takeWhile(_ != '#').trim).flatMap { line =>
      val i = line.indexOf(':')
      if (i > 0 && line.substring(0, i).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(i + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }.toSeq

  /** Longest-match decision for one path. No matching rule → allowed. */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    val hits = rules.filter(_.matches(path))
    if (hits.isEmpty) true
    else {
      val best = hits.map(_.specificity).max
      val top = hits.filter(_.specificity == best)
      top.exists(_.allow) // Allow wins the length tie
    }
  }

  /** Column kernel: is `url`'s path allowed under `rules`? NO UDF: each
    * rule compiles to one anchored `rlike` regex (`*` → `.*`, literal
    * segments \Q-quoted, `$` honored) and the longest-match decision is a
    * CASE chain in specificity order (Allow first on ties) — fully
    * codegen'd, rule sets are KB-scale so the expression tree stays tiny,
    * and the frontier stream never shuffles. */
  def allowedCol(rules: Seq[Rule], url: Column): Column = {
    val raw = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/[^?#]*)?", 1)
    val path = when(raw === "", lit("/")).otherwise(raw)
    val ordered = rules.sortBy(r => (-r.specificity, !r.allow))
    ordered.foldRight(lit(true)) { (r, tail) =>
      when(path.rlike(ruleRegex(r)), lit(r.allow)).otherwise(tail)
    }
  }

  /** The rule's RFC-9309 match as a java regex (prefix-anchored, `*`
    * spans any run, `$` pins the end, literals \Q-quoted). */
  private[pipeline] def ruleRegex(r: Rule): String = {
    val body = if (r.anchored) r.pattern.dropRight(1) else r.pattern
    val segs = body.split("\\*", -1).map(s =>
      if (s.isEmpty) "" else java.util.regex.Pattern.quote(s))
    "^" + segs.mkString(".*") + (if (r.anchored) "$" else "")
  }

  /** Frontier filter: keep rows whose url the policy allows. */
  def filterAllowed(frontier: DataFrame, rules: Seq[Rule],
                    urlCol: String = "url"): DataFrame =
    frontier.filter(allowedCol(rules, col(urlCol)))
}
