package graft.engine

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class FeedIngestSpec extends AnyFunSuite {
  private val now = CrawlDefaults.VirtualEpochMs
  private def freshState = FeedPollState("s1", "", 0, 0, "", 0L)

  private val rss =
    """<?xml version="1.0"?>
      |<rss version="2.0"><channel>
      |  <title>Feed</title><link>https://site.example/</link>
      |  <item><title>A</title><link>https://site.example/news/a-story</link></item>
      |  <item><title>B</title><link> https://site.example/news/b-story </link></item>
      |</channel></rss>""".stripMargin

  private val atom =
    """<?xml version="1.0"?>
      |<feed xmlns="http://www.w3.org/2005/Atom">
      |  <title>F</title>
      |  <entry><link href="https://site.example/posts/one"/></entry>
      |  <entry><link href="https://site.example/posts/two"/></entry>
      |</feed>""".stripMargin

  private val sitemap =
    """<?xml version="1.0"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url><loc>https://site.example/p/1</loc><lastmod>2024-01-01</lastmod></url>
      |  <url><loc>https://site.example/p/2</loc></url>
      |</urlset>""".stripMargin

  private val sitemapIndex =
    """<?xml version="1.0"?>
      |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <sitemap><loc>https://site.example/sitemap1.xml</loc></sitemap>
      |  <sitemap><loc>https://site.example/sitemap2.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin

  test("RSS item links parsed in order (feed/parser.go:26-60)") {
    assert(FeedIngest.parseFeedLinks(rss) == Right(Seq(
      "https://site.example/news/a-story", "https://site.example/news/b-story")))
  }

  test("Atom entry link hrefs parsed") {
    assert(FeedIngest.parseFeedLinks(atom) == Right(Seq(
      "https://site.example/posts/one", "https://site.example/posts/two")))
  }

  test("sitemap urlset and sitemapindex parsed (feed/sitemap.go:49-130)") {
    assert(FeedIngest.parseSitemap(sitemap) ==
      Right((Seq("https://site.example/p/1", "https://site.example/p/2"), Nil)))
    assert(FeedIngest.parseSitemap(sitemapIndex) ==
      Right((Nil, Seq("https://site.example/sitemap1.xml",
        "https://site.example/sitemap2.xml"))))
  }

  test("feed auto-discovery: link tags first, validated; common paths fallback") {
    val base = "https://site.example/"
    def page(url: String, status: Int = 200, body: String = "",
        alts: Seq[(String, String)] = Nil) =
      url -> FeedProbePage(url, status, body, alts)
    // HTML advertises two alternates: a dead one first, then a valid one
    val world = Map(
      page(base, alts = Seq(
        ("application/rss+xml", "/broken-feed"),
        ("text/css", "/styles.css"), // wrong type: never considered
        ("application/atom+xml", "https://site.example/real-atom"))),
      page("https://site.example/broken-feed", body = "<html>not a feed"),
      page("https://site.example/real-atom", body = atom))
    assert(FeedDiscovery.discoverFeed(base, world.get)
      == "https://site.example/real-atom")

    // no link tags → well-known paths probed in order, first valid wins
    val world2 = Map(
      page(base),
      page("https://site.example/feed", status = 404, body = rss),
      page("https://site.example/rss.xml", body = rss))
    assert(FeedDiscovery.discoverFeed(base, world2.get)
      == "https://site.example/rss.xml")

    // feeds that parse but carry zero items do not validate
    val emptyRss = "<rss version=\"2.0\"><channel><title>E</title></channel></rss>"
    val world3 = Map(page(base), page("https://site.example/feed", body = emptyRss))
    assert(FeedDiscovery.discoverFeed(base, world3.get) == "")
  }

  test("feed auto-discovery sweep: distributed pass + retry-window skip") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val base1 = "https://one.example/"
    val base2 = "https://two.example/"
    val world = Map(
      base1 -> FeedProbePage(base1, 200, "", Nil),
      s"${base1.dropRight(1)}/feed" -> FeedProbePage(s"${base1}feed", 200, rss, Nil),
      "https://one.example/feed" -> FeedProbePage("https://one.example/feed", 200, rss, Nil),
      base2 -> FeedProbePage(base2, 200, "", Nil))
    val sources = Seq(
      UndiscoveredSource("s1", base1),
      UndiscoveredSource("s2", base2),
      UndiscoveredSource("s3", base1)).toDS()
    val out = FeedDiscovery.discoverFeeds(spark, sources, world,
      lastAttempt = Map("s3" -> 900L), retryAfterMs = 1000L, now = 1500L)
      .collect().map(r => r._1 -> r._2).toMap
    assert(out == Map("s1" -> "https://one.example/feed", "s2" -> ""))
    // s3 re-attempted once the window passes
    val later = FeedDiscovery.discoverFeeds(spark, sources, world,
      lastAttempt = Map("s3" -> 900L), retryAfterMs = 1000L, now = 2000L)
      .collect().map(_._1).toSet
    assert(later.contains("s3"))
  }

  test("feed items submit at priority 7, sitemap at 6 (domain/frontier.go:29-34)") {
    val (subs, st) = FeedIngest.poll(
      FeedRow("s1", "https://site.example/feed.xml", rss, "", 200, "rss"),
      freshState, now)
    assert(subs.map(_.priority).distinct == Seq(7))
    assert(subs.map(_.origin).distinct == Seq(FrontierOrigin.Feed))
    assert(subs.head.url == "https://site.example/news/a-story")
    assert(st.last_item_count == 2 && st.consecutive_errors == 0)

    val (smSubs, _) = FeedIngest.poll(
      FeedRow("s1", "https://site.example/sitemap.xml", sitemap, "", 200, "sitemap"),
      freshState, now)
    assert(smSubs.map(_.priority).distinct == Seq(6))
    assert(smSubs.map(_.origin).distinct == Seq(FrontierOrigin.Sitemap))
  }

  test("conditional GET: unchanged etag skips items (poller.go:109-122)") {
    val feed = FeedRow("s1", "u", rss, "W/\"v1\"", 200, "rss")
    val (subs1, st1) = FeedIngest.poll(feed, freshState, now)
    assert(subs1.size == 2 && st1.last_etag == "W/\"v1\"")
    val (subs2, st2) = FeedIngest.poll(feed, st1.copy(next_poll_at = 0L), now)
    assert(subs2.isEmpty && st2.consecutive_errors == 0)
  }

  test("rate-limit backoff: LEAST(2^errors,96)*5min (feed_state_repository.go:76-78)") {
    assert(FeedIngest.backoffMs(1) == 2 * 5 * 60000L)
    assert(FeedIngest.backoffMs(3) == 8 * 5 * 60000L)
    assert(FeedIngest.backoffMs(20) == 96 * 5 * 60000L)
    val limited = FeedRow("s1", "u", rss, "", 429, "rss")
    val (subs, st) = FeedIngest.poll(limited, freshState, now)
    assert(subs.isEmpty)
    assert(st.last_error_type == "rate_limited")
    assert(st.next_poll_at == now + 2 * 5 * 60000L)
  }

  test("http and parse errors classified with backoff, not-due feeds skipped") {
    val (s1, st1) = FeedIngest.poll(FeedRow("s1", "u", rss, "", 500, "rss"),
      freshState, now)
    assert(s1.isEmpty && st1.last_error_type == "http_error")
    val (s2, st2) = FeedIngest.poll(FeedRow("s1", "u", "<rss><broken", "", 200, "rss"),
      freshState, now)
    assert(s2.isEmpty && st2.last_error_type == "parse_error")
    val (s3, st3) = FeedIngest.poll(FeedRow("s1", "u", rss, "", 200, "rss"),
      freshState.copy(next_poll_at = now + 1), now)
    assert(s3.isEmpty && st3 == freshState.copy(next_poll_at = now + 1))
  }
}
