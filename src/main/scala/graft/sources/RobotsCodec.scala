package graft.sources

/** robots.txt codec (RFC 9309) — crawl politeness as a first-class
  * curation input: corpora like C4 record per-URL robots decisions,
  * and republishing disallowed content is a compliance bug, so the
  * engine carries both the rule PARSE (q_robots_rules) and the
  * longest-match DECISION as a broadcast join (q_robots_filter:
  * per-host rules are bounded by the RFC's 500 KiB cap, the URL side
  * is the 100 TB table — exactly the broadcast-dimension shape).
  *
  * Grammar: `key: value` lines, `#` comments, case-insensitive
  * directives; stacked `User-agent` lines open one group; `Allow` /
  * `Disallow` / `Crawl-delay` attach to the open group; `Sitemap` is
  * global (agent ""). Matching (in the query, not here): the group
  * whose agent exactly matches wins over `*`; among matching rules
  * the LONGEST pattern wins, allow beating disallow on ties; `*`
  * wildcards and a trailing `$` anchor; an empty pattern matches
  * nothing; no match → allowed.
  *
  * Parse never refuses — RFC 9309 requires tolerating garbage lines
  * (they are skipped), so unlike the binary codecs the contract is
  * total. Never throws. */
object RobotsCodec {

  /** One parsed line: agent "" marks global extensions (sitemap). */
  case class Rule(agent: String, verb: String, value: String, seq: Int)

  val MaxRules: Int = 10000

  /** Caps on EMITTED rows, not just logical lines: one rule line fans
    * out to one Rule per stacked agent, so a hostile sub-500 KiB file
    * with ~30k stacked User-agent lines over 10k rules would otherwise
    * emit ~3e8 Rule objects — an OOM vector in a parser whose contract
    * is total (never refuses). Real robots files stack a handful of
    * agents. The stacking cap must NOT silently drop an agent from a
    * group — a dropped agent loses its Disallow lines and falls
    * through to allowed-by-default, i.e. truncation toward
    * OVER-crawling — so the cap is raised to the line budget and,
    * whenever ANY cap (stack, rules, emitted) actually drops
    * something, [[parse]] appends a `truncated` sentinel rule so
    * callers can tell a capped parse from a complete one. */
  val MaxStackedAgents: Int = MaxRules
  val MaxEmitted: Int = 100000

  /** Sentinel appended when MaxEmitted truncates the fan-out: agent
    * "" (the global namespace, like sitemap) + this verb. Decision
    * layers treat its presence as "parse incomplete". */
  val TruncatedVerb: String = "x-graft-truncated"

  def parse(content: String): Vector[Rule] = {
    val out = Vector.newBuilder[Rule]
    var agents = Vector.empty[String]
    var openGroup = false // user-agent lines still stackable
    var seq = 0
    var emitted = 0
    var dropped = false // any rule row lost to a cap → sentinel
    def emit(verb: String, value: String): Unit = {
      if (seq < MaxRules && emitted < MaxEmitted) {
        agents.foreach { a =>
          if (emitted < MaxEmitted) { out += Rule(a, verb, value, seq); emitted += 1 }
          else dropped = true
        }
        seq += 1
      } else dropped = true
    }
    content.split("\n", -1).foreach { raw =>
      val line = raw.split("#", 2)(0).trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val k = line.substring(0, ci).trim
          .toLowerCase(java.util.Locale.ROOT)
        val v = line.substring(ci + 1).trim
        k match {
          case "user-agent" =>
            if (!openGroup && agents.nonEmpty) agents = Vector.empty
            if (agents.size < MaxStackedAgents)
              agents = agents :+ v.toLowerCase(java.util.Locale.ROOT)
            else dropped = true // an agent losing its group's rules
            openGroup = true
          case "allow" | "disallow" | "crawl-delay" =>
            openGroup = false
            if (agents.nonEmpty) emit(k, v)
          case "sitemap" =>
            if (seq < MaxRules) {
              out += Rule("", k, v, seq)
              seq += 1
            } else dropped = true // a sitemap row lost to the cap
          case _ => () // unknown directive: tolerated per the RFC
        }
      }
    }
    if (dropped) out += Rule("", TruncatedVerb, "", seq)
    out.result()
  }

  /** RFC 9309 pattern → Java regex: literal characters escaped, `*`
    * becomes `.*`, one trailing `$` anchors; unanchored patterns are
    * prefix matches. */
  def patternRegex(pat: String): String = {
    val anchored = pat.endsWith("$")
    val body = if (anchored) pat.substring(0, pat.length - 1) else pat
    val sb = new java.lang.StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\^$.|?+()[]{}".indexOf(c.toInt) >= 0 =>
        sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$')
    sb.toString
  }

  /** RFC 9309 pattern match WITHOUT regex compilation — the hot-path
    * form [[graft.expressions.RobotsMatch]] codegens against, so the
    * URL-scale decision join never compiles a Pattern per row. Exactly
    * equivalent to `path matches patternRegex(pat)`: the pattern is a
    * PREFIX match of literal segments separated by `*` wildcards, with
    * one trailing `$` anchoring the end; an empty pattern matches
    * nothing. Greedy leftmost placement of interior segments is
    * optimal for this single-wildcard-class grammar (placing a segment
    * earlier never blocks a later one), and the anchored tail is
    * matched as a suffix, so no backtracking is ever needed — O(n·m)
    * worst case on short patterns, no allocation beyond split. */
  def matches(path: String, pat: String): Boolean = {
    if (path == null || pat == null || pat.isEmpty) return false
    val anchored = pat.endsWith("$")
    val body = if (anchored) pat.substring(0, pat.length - 1) else pat
    val segs = body.split("\\*", -1)
    if (!path.startsWith(segs(0))) return false
    if (segs.length == 1)
      return !anchored || path.length == segs(0).length
    var pos = segs(0).length
    var i = 1
    while (i < segs.length - 1) {
      val s = segs(i)
      if (s.nonEmpty) {
        val at = path.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      }
      i += 1
    }
    val last = segs(segs.length - 1)
    if (anchored) path.length - last.length >= pos && path.endsWith(last)
    else last.isEmpty || path.indexOf(last, pos) >= 0
  }
}
