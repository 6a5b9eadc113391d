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
    // Pathological third-party pattern must match in linear-ish time,
    // not exponential recursion (robots.txt is untrusted input).
    val evil = "/" + "*a" * 15 + "*b"
    val long = "/" + "a" * 120
    val t0 = System.nanoTime()
    assert(!Robots.patternMatches(evil, long))
    assert(Robots.patternMatches(evil, long + "b"))
    assert((System.nanoTime() - t0) / 1e6 < 1000.0,
      "wildcard matching must not blow up on hostile patterns")
  }

  test("RFC 9309 group merging, empty agent tokens, and BOM headers") {
    // Two * groups MERGE (a find-first would ignore the second).
    val two = Robots.parse(
      "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n")
    assert(!Robots.isAllowed(two, "any", "/a/x"))
    assert(!Robots.isAllowed(two, "any", "/b/x"),
      "later same-agent groups must merge, not drop")
    assert(Robots.isAllowed(two, "any", "/c"))
    // An empty User-agent value must not create a match-everything
    // token shadowing the * fallback.
    val empty = Robots.parse(
      "User-agent:\nDisallow: /\n\nUser-agent: *\nAllow: /\n")
    assert(Robots.isAllowed(empty, "foobot", "/anything"),
      "empty product tokens are invalid and must not match")
    // BOM-prefixed files keep their first group.
    val bom = Robots.parse("﻿User-agent: *\nDisallow: /x\n")
    assert(!Robots.isAllowed(bom, "any", "/x/y"),
      "a BOM must not make the compliance kernel fail open")
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
