package graft.operators

import graft.SparkSpec

class RobotsSpec extends SparkSpec {

  private val txt =
    """# site robots
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok
      |Disallow: /tmp*$
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /only$
      |Allow:
      |Crawl-delay: 2.5
      |
      |Sitemap: https://example.com/sitemap.xml
      |Unknown-directive: whatever
      |""".stripMargin

  test("RFC 9309 decisions: longest match wins, allow wins ties, " +
    "wildcards and anchors, group selection by longest agent token") {
    val r = Robots.parse(txt)
    assert(r.sitemaps == Vector("https://example.com/sitemap.xml"))
    def ok(agent: String, path: String): Boolean =
      Robots.isAllowed(r, agent, path)
    // * group.
    assert(!ok("anybot/1.0", "/private/x"))
    assert(ok("anybot/1.0", "/private/ok/page"), "longer Allow wins")
    assert(ok("anybot/1.0", "/public"))
    // $ anchor with wildcard: /tmp*$ blocks /tmpfoo but not /tmpfoo/x?
    // pattern /tmp*$ matches ANY path starting /tmp (the * absorbs the
    // rest, $ anchors at end) — both blocked.
    assert(!ok("anybot/1.0", "/tmpfoo"))
    assert(!ok("anybot/1.0", "/tmp/a/b"))
    // graftbot group: its own rules only (no inheritance from *).
    assert(ok("graftbot/2.0", "/private/x"),
      "a specific group does NOT inherit the * rules")
    assert(!ok("mozilla compatible graftbot", "/only"))
    assert(ok("graftbot", "/only/sub"), "$ anchors exactly")
    assert(Robots.crawlDelay(r, "graftbot").contains(2.5))
    assert(Robots.crawlDelay(r, "anybot").isEmpty)
    // No group at all -> allowed.
    val noStar = Robots.parse("User-agent: x\nDisallow: /\n")
    assert(Robots.isAllowed(noStar, "unrelated", "/anything"))
    // Disallow: / blocks everything for its group.
    assert(!Robots.isAllowed(noStar, "x-crawler", "/anything"))
    // Garbage input parses to no groups -> allowed.
    assert(Robots.isAllowed(Robots.parse("%%% not robots"), "a", "/p"))
    assert(Robots.isAllowed(Robots.parse(null), "a", "/p"))
  }

  test("pattern matcher: wildcard backtracking and anchor edges") {
    assert(Robots.patternMatches("/a*b*c", "/aXXbYYc-and-more"))
    assert(!Robots.patternMatches("/a*b$", "/aXXbY"))
    assert(Robots.patternMatches("/a*b$", "/aXXb"))
    assert(Robots.patternMatches("/", "/anything"))
    assert(Robots.patternMatches("*", "/x"))
    assert(!Robots.patternMatches("/fish", "/Fish"), "case-sensitive paths")
  }

  test("sitemaps: urlset and sitemapindex both parse; junk is None") {
    val urlset =
      ("""<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/""" +
        """schemas/sitemap/0.9"><url><loc>https://e.com/a</loc>""" +
        """<lastmod>2026-01-02</lastmod></url>""" +
        """<url><loc> https://e.com/b </loc></url></urlset>""").getBytes
    val got = Robots.sitemap(urlset).get
    assert(got.map(_.loc) == Seq("https://e.com/a", "https://e.com/b"))
    assert(got.head.lastmod.contains("2026-01-02") && got(1).lastmod.isEmpty)
    assert(got.forall(!_.isIndex))
    val index =
      ("""<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc>""" +
        """</sitemap></sitemapindex>""").getBytes
    val gi = Robots.sitemap(index).get
    assert(gi.map(_.loc) == Seq("https://e.com/s1.xml") && gi.head.isIndex)
    assert(Robots.sitemap("<html><body/></html>".getBytes).isEmpty)
    assert(Robots.sitemap("not xml at all".getBytes).isEmpty)
    assert(Robots.sitemap(null).isEmpty)
  }
}
