package graft

import graft.sources.RobotsCodec

/** Contract specs for the robots.txt surface: the RFC 9309 grammar
  * (stacked agents, comments, case-insensitivity, garbage tolerance),
  * the pattern→regex compiler, and the decision join's semantics
  * (group override, longest match, allow-wins-ties, wildcards,
  * anchors). Value grading runs through oracles q_robots_rules /
  * q_robots_filter. */
class RobotsCodecSpec extends SparkSpec {

  test("grammar: stacked agents, groups, comments, case, garbage") {
    val rs = RobotsCodec.parse(
      """# header comment
        |User-agent: A
        |User-agent: B
        |Disallow: /x  # trailing comment
        |ALLOW: /x/y
        |
        |user-agent: C
        |crawl-delay: 5
        |not a directive
        |Weird-Key: ignored
        |Sitemap: https://h/s.xml
        |""".stripMargin)
    assert(rs.filter(_.verb == "disallow").map(_.agent) ==
      Vector("a", "b"))
    assert(rs.filter(_.verb == "allow").map(_.value) ==
      Vector("/x/y", "/x/y"))
    assert(rs.find(_.agent == "c").get.verb == "crawl-delay")
    assert(rs.find(_.verb == "sitemap").get.agent == "")
    // a rule line before any group attaches to nothing
    assert(RobotsCodec.parse("Disallow: /early\n").isEmpty)
    // a SECOND group reuses an agent: the rule list restarts
    val two = RobotsCodec.parse(
      "User-agent: a\nDisallow: /1\nUser-agent: a\nDisallow: /2\n")
    assert(two.map(_.value) == Vector("/1", "/2"))
  }

  test("pattern compiler: wildcards, anchors, regex metacharacters") {
    // rlike semantics (find, not full-match) — the ^-anchored compile
    // makes find() a prefix match, exactly Python's re.match
    def m(pat: String, path: String): Boolean =
      java.util.regex.Pattern.compile(RobotsCodec.patternRegex(pat))
        .matcher(path).find()
    assert(m("/cart", "/cart") && m("/cart", "/cart/item"))
    assert(!m("/cart", "/car"))
    assert(m("/admin/*", "/admin/x/y") && !m("/admin/*", "/admin"))
    assert(m("/*.pdf$", "/a/b.pdf") && !m("/*.pdf$", "/a/b.pdfx"))
    assert(m("/a+b(c)", "/a+b(c)d"), "metacharacters must be literal")
    assert(!m("/a+b(c)", "/aab(c)"))
  }

  test("decision join: group override, longest match, allow wins ties") {
    val df = graft.queries.TextQueries.qRobotsFilter(spark, "")
    val rows = df.collect().map(r => ((r.getString(0), r.getString(1),
      r.getString(2)), (r.getInt(3), r.getString(4)))).toMap
    // graftbot's own group overrides * entirely
    assert(rows(("shop.example", "graftbot", "/paper.pdf")) == ((1, "")))
    assert(rows(("shop.example", "graftbot", "/cart/shared/list")) ==
      ((1, "/cart/shared")), "longest match: allow beats /cart")
    // unknown agent falls to *: wildcard and anchor rules fire
    assert(rows(("shop.example", "crawlzilla", "/admin/secret")) ==
      ((0, "/admin/*")))
    assert(rows(("shop.example", "crawlzilla", "/downloads/guide.pdf")) ==
      ((1, "/downloads/*.pdf$")), "longer allow beats /*.pdf$")
    // empty disallow = allow-all; empty file = allow-all
    assert(rows(("news.example", "graftbot", "/")) == ((1, "")))
    assert(rows(("blank.example", "crawlzilla", "/anything/goes")) ==
      ((1, "")))
    assert(rows.size == 24)
    // the scale shape: rules broadcast, no shuffle join on the URL side
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
