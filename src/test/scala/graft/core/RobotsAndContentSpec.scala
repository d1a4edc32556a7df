package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RobotsAndContentSpec extends AnyFunSuite {

  test("robots: non-2xx and fetch-error responses mean allow-all (robots.go:195-218)") {
    assert(RobotsRules.fromResponse("User-agent: *\nDisallow: /", 404, "bot")
      .isAllowed("/anything"))
    assert(RobotsRules.fromResponse("User-agent: *\nDisallow: /", 500, "bot")
      .isAllowed("/anything"))
    assert(!RobotsRules.fromResponse("User-agent: *\nDisallow: /", 200, "bot")
      .isAllowed("/anything"))
  }

  test("robots: prefix disallow with allow override, longest match wins") {
    val r = RobotsRules.parse(
      "User-agent: *\nDisallow: /private/\nAllow: /private/public/\n", "bot")
    assert(r.isAllowed("/open/page"))
    assert(!r.isAllowed("/private/doc"))
    assert(r.isAllowed("/private/public/doc"))
  }

  test("robots: group selection by agent prefix; * is fallback") {
    val body =
      """User-agent: evilbot
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /admin/
        |Crawl-delay: 2
        |""".stripMargin
    val us = RobotsRules.parse(body, "graft-bot")
    assert(us.isAllowed("/news/x"))
    assert(!us.isAllowed("/admin/x"))
    assert(us.crawlDelayMs.contains(2000L))
    val evil = RobotsRules.parse(body, "evilbot/1.0")
    assert(!evil.isAllowed("/news/x"))
  }

  test("robots: * wildcard and $ end anchor (RFC 9309 / temoto semantics)") {
    val r = RobotsRules.parse(
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /tmp/*
        |Allow: /tmp/keep
        |Disallow: /fish*.php
        |""".stripMargin, "bot")
    // $ anchors: blocks the exact extension, not query-extended paths
    assert(!r.isAllowed("/docs/report.pdf"))
    assert(r.isAllowed("/docs/report.pdf?download=1"))
    assert(r.isAllowed("/docs/report.pdfx"))
    // * spans path segments
    assert(!r.isAllowed("/tmp/a/b/c"))
    assert(!r.isAllowed("/fish/deep/page.php"))
    assert(r.isAllowed("/fishing/page.html"))
    // longest raw pattern wins: Allow:/tmp/keep (9) > Disallow:/tmp/* (6)
    assert(r.isAllowed("/tmp/keep"))
    assert(r.isAllowed("/tmp/keepsake"))
  }

  test("robots: specificity ties → allow; mid-pattern $ is literal") {
    val tie = RobotsRules.parse(
      "User-agent: *\nDisallow: /page\nAllow: /page\n", "bot")
    assert(tie.isAllowed("/page"))
    val lit = RobotsRules.parse(
      "User-agent: *\nDisallow: /a$b/\n", "bot")
    assert(!lit.isAllowed("/a$b/x"))
    assert(lit.isAllowed("/ab/x"))
    // regex metacharacters in patterns stay literal
    val meta = RobotsRules.parse(
      "User-agent: *\nDisallow: /a.b(c)/\n", "bot")
    assert(!meta.isAllowed("/a.b(c)/x"))
    assert(meta.isAllowed("/aXb(c)/x"))
  }

  test("robots: comments, empty disallow, and unknown directives ignored") {
    val r = RobotsRules.parse(
      "# comment\nUser-agent: *\nDisallow:\nSitemap: https://x/s.xml\n", "bot")
    assert(r.isAllowed("/anything"))
  }

  test("content URL heuristics (content_detector.go:204-283)") {
    // date paths and long slugs are content
    assert(ContentUrl.isContentUrl("https://x.com/2026/02/14/big-headline"))
    assert(ContentUrl.isContentUrl("https://x.com/a-four-word-slug"))
    // content segment must not be last
    assert(ContentUrl.isContentUrl("https://x.com/news/local-update"))
    assert(!ContentUrl.isContentUrl("https://x.com/news"))
    // non-content segments and binary extensions are never content
    assert(!ContentUrl.isContentUrl("https://x.com/login/this-is-a-long-slug"))
    assert(!ContentUrl.isContentUrl("https://x.com/news/2026/02/report.pdf"))
    // single short segment is not content
    assert(!ContentUrl.isContentUrl("https://x.com/about-us"))
    // explicit per-source patterns decide alone when present
    assert(ContentUrl.isContentUrl("https://x.com/anything",
      Seq("""/anything""".r)))
    assert(!ContentUrl.isContentUrl("https://x.com/2026/02/14/headline",
      Seq("""/nomatch""".r)))
  }

  test("binary URL gate (worker.go:509-526)") {
    assert(ContentUrl.isBinaryUrl("https://x.com/file.PDF"))
    assert(ContentUrl.isBinaryUrl("https://x.com/a/downloadmp3.php?id=1"))
    assert(!ContentUrl.isBinaryUrl("https://x.com/article/pdf-reader-review"))
  }

  test("HTML content type gate (worker.go:499-505): empty counts as HTML") {
    assert(ContentUrl.isHtmlContent(""))
    assert(ContentUrl.isHtmlContent("text/html; charset=utf-8"))
    assert(ContentUrl.isHtmlContent("application/xhtml+xml"))
    assert(!ContentUrl.isHtmlContent("application/pdf"))
    assert(!ContentUrl.isHtmlContent("application/json"))
  }

  test("link skip gate (link_handler.go:100-122): relative pass, non-http skip") {
    assert(ContentUrl.shouldSkipLink(""))
    assert(ContentUrl.shouldSkipLink("mailto:a@b.c"))
    assert(ContentUrl.shouldSkipLink("javascript:void(0)"))
    assert(ContentUrl.shouldSkipLink("ftp://x.com/file"))
    assert(!ContentUrl.shouldSkipLink("/relative/path"))
    assert(!ContentUrl.shouldSkipLink("page.html"))
    assert(!ContentUrl.shouldSkipLink("https://x.com/a"))
    assert(!ContentUrl.shouldSkipLink("HTTP://x.com/a"))
  }

  test("URL resolution matches RFC 3986 merge after normalization") {
    def resolveNorm(base: String, href: String): String = {
      val abs = GoUrl.absoluteUrl(base, href)
      UrlNormalizer.normalize(abs).getOrElse(s"ERR:$abs")
    }
    assert(resolveNorm("https://x.com/a/b", "/c") == "https://x.com/c")
    assert(resolveNorm("https://x.com/a/b", "c") == "https://x.com/a/c")
    assert(resolveNorm("https://x.com/a/b", "../c") == "https://x.com/c")
    assert(resolveNorm("https://x.com/a/b", "#frag") == "https://x.com/a/b")
    assert(resolveNorm("https://x.com/a/b", "//other.com/z") == "https://other.com/z")
    assert(resolveNorm("https://x.com/a/b", "http://other.com/z") == "https://other.com/z")
    assert(resolveNorm("https://x.com/a/b", "?q=1") == "https://x.com/a/b?q=1")
  }
}
