package graft.functions

/** robots.txt parsing and path matching per RFC 9309 (Robots Exclusion
  * Protocol) — the crawl-compliance gate a web-corpus pipeline applies
  * before a fetched page may enter the training set (reference behavior:
  * ingest pipelines filter fetched URLs against per-host policy; cf.
  * /root/reference's ingest-side source filtering, re-expressed for the
  * web-crawl axis this round's WARC/URL/domain operators opened).
  *
  * Implemented semantics (the RFC's normative core):
  *   - groups: consecutive `User-agent:` lines open a group that collects
  *     the following `Allow:`/`Disallow:` rules; multiple groups naming
  *     the same agent MERGE (RFC 9309 §2.2.1); agent tokens compare
  *     case-insensitively; `#` starts a comment; unknown directives
  *     (crawl-delay, sitemap, host) are ignored and do NOT break a group.
  *   - group selection: the crawler's product token picks its exact
  *     group if one exists, else the `*` group, else everything is
  *     allowed (§2.2.1 — "most specific match"; product tokens are
  *     atoms here, so specificity = exact-over-wildcard).
  *   - rule matching (§2.2.2-2.2.3): a pattern matches any path it
  *     prefixes; `*` matches any run of octets; a trailing `$` anchors
  *     the match at the end of the path. The most-octets matching rule
  *     wins; an Allow and Disallow of EQUAL length tie to Allow. An
  *     empty pattern (`Disallow:` alone — "allow all") never matches.
  *   - no matching rule → allowed (§2.2.2).
  *
  * Everything is pure string scanning — no regex compilation per row —
  * and deterministic, so decisions replay identically anywhere. */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)

  /** Parse a robots.txt body into agent-token → merged rule list. */
  def parse(txt: String): Map[String, Vector[Rule]] = {
    var groups = Map.empty[String, Vector[Rule]]
    var agents: List[String] = Nil
    var inRules = false
    for (raw <- txt.split("\n", -1)) {
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { agents = Nil; inRules = false }
            val a = value.toLowerCase
            if (a.nonEmpty) {
              agents = a :: agents
              if (!groups.contains(a)) groups = groups.updated(a, Vector.empty)
            }
          case "allow" | "disallow" =>
            inRules = true
            if (value.nonEmpty) {
              val r = Rule(key == "allow", value)
              for (a <- agents)
                groups = groups.updated(a, groups(a) :+ r)
            }
          case _ => () // crawl-delay / sitemap / unknown: ignored
        }
      }
    }
    groups
  }

  /** RFC 9309 wildcard match: returns the pattern's length (its octet
    * precedence) when it matches `path`, -1 otherwise. Empty patterns
    * never match. Greedy left-to-right segment placement is exact for
    * this grammar: with only `*` separators, matching each literal
    * segment at its earliest position never blocks a later segment,
    * and a trailing `$` is checked against the path end directly. */
  def matchLen(pattern: String, path: String): Int = {
    if (pattern.isEmpty) return -1
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val segs = pat.split("\\*", -1)
    if (!path.startsWith(segs(0))) return -1
    var idx = segs(0).length
    var i = 1
    while (i < segs.length) {
      val sgm = segs(i)
      if (i == segs.length - 1 && anchored) {
        if (path.length - sgm.length < idx || !path.endsWith(sgm)) return -1
        idx = path.length
      } else if (sgm.nonEmpty) {
        val found = path.indexOf(sgm, idx)
        if (found < 0) return -1
        idx = found + sgm.length
      }
      i += 1
    }
    if (anchored && segs.length == 1 && idx != path.length) -1
    else pattern.length
  }

  /** `Sitemap:` directive values in document order (duplicates kept —
    * callers canonicalize + dedup alongside the discovered-URL stream).
    * The directive is group-INDEPENDENT per sitemaps.org and RFC 9309
    * §2.2.4 (other records): it may appear anywhere in the file, so
    * this scan ignores group structure entirely. The standard crawl
    * BOOTSTRAP channel: robots.txt is the one URL a crawler always
    * fetches first, and its Sitemap lines seed the frontier before any
    * page has been parsed. */
  def sitemaps(txt: String): Vector[String] = {
    if (txt == null) return Vector.empty
    txt.split("\n", -1).iterator
      .map(_.takeWhile(_ != '#').trim)
      .flatMap { line =>
        val ci = line.indexOf(':')
        // the VALUE itself contains ':' (http://...) — key is before the
        // FIRST colon only
        if (ci <= 0) None
        else if (!line.substring(0, ci).trim
            .equalsIgnoreCase("sitemap")) None
        else Some(line.substring(ci + 1).trim).filter(_.nonEmpty)
      }.toVector
  }

  /** `Crawl-delay:` seconds for `agent` (exact group, else `*`, else
    * None) — the de-facto politeness pacing signal (not in RFC 9309 but
    * honored by Bing/Yandex and ubiquitous in the wild). The directive
    * binds to the group like Allow/Disallow; a later repeat within the
    * same group wins (last-wins, matching how crawlers re-read the
    * file top to bottom). GROUP SELECTION comes first, exactly as in
    * [[isAllowed]]: an agent with its own group never inherits `*`'s
    * delay, even when its group states none. Non-numeric values are
    * ignored; fractional seconds are honored. */
  def crawlDelayOf(txt: String, agent: String): Option[Double] = {
    if (txt == null) return None
    val agentLc = agent.toLowerCase
    var delays = Map.empty[String, Double]
    var seen = Set.empty[String]
    var agents: List[String] = Nil
    var inRules = false
    for (raw <- txt.split("\n", -1)) {
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { agents = Nil; inRules = false }
            if (value.nonEmpty) {
              agents = value.toLowerCase :: agents
              seen += value.toLowerCase
            }
          case "allow" | "disallow" => inRules = true
          case "crawl-delay" =>
            inRules = true
            value.toDoubleOption.filter(d => d >= 0 && d.isFinite)
              .foreach(d => for (a <- agents)
                delays = delays.updated(a, d))
          case _ => ()
        }
      }
    }
    if (seen.contains(agentLc)) delays.get(agentLc)
    else delays.get("*")
  }

  /** Full per-(robots, agent, path) decision — parse + select + longest
    * match with allow-wins ties. One-shot form; at corpus scale parse
    * each host's robots ONCE and run the relational argmax instead
    * ([[graft.operators.WebArchive.robotsDecisions]]). */
  def isAllowed(txt: String, agent: String, path: String): Boolean = {
    val groups = parse(if (txt == null) "" else txt)
    val rules = groups.get(agent.toLowerCase).orElse(groups.get("*"))
      .getOrElse(return true)
    val matches = rules.iterator
      .map(r => (matchLen(r.pattern, path), r.allow))
      .filter(_._1 >= 0).toVector
    if (matches.isEmpty) true
    else {
      val mx = matches.iterator.map(_._1).max
      matches.exists(m => m._1 == mx && m._2)
    }
  }
}
