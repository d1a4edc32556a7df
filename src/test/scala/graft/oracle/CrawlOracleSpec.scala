package graft.oracle

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the oracle to the behaviors the reference's repository tests assert
  * (database/frontier_repository_test.go: Submit_DuplicateUpdatesPriority:83,
  * Claim_ReturnsHighestPriority:146, UpdateFailed_MarksDeadAtMaxRetries:271,
  * politeness predicate frontier_repository.go:155-157).
  */
class CrawlOracleSpec extends AnyFunSuite {

  private def page(url: String, status: Int = 200, links: Seq[String] = Nil,
      redirect: String = "", ct: String = "text/html; charset=utf-8",
      extractOk: Boolean = true): PageRow = {
    val h = UrlNormalizer.extractHost(url).toOption.get
    PageRow(UrlNormalizer.sha256Hex(url), url, UrlNormalizer.sha256Hex(url), h,
      status, redirect, ct, "", extractOk,
      Seq(Span("text", s"body of $url", "", 0)), links)
  }

  private def corpus(ps: PageRow*): Map[String, PageRow] =
    ps.map(p => p.url_hash -> p).toMap

  private def sub(url: String, priority: Int = 5, depth: Int = 0,
      at: Long = CrawlDefaults.VirtualEpochMs): Submission = {
    val Right(u) = UrlNormalizer.normalize(url): @unchecked
    Submission(u, UrlNormalizer.sha256Hex(u),
      UrlNormalizer.extractHost(u).toOption.get, "s", FrontierOrigin.Manual,
      None, depth, priority, at)
  }

  test("Submit: duplicate updates pending row to GREATEST priority, LEAST time") {
    val o = new CrawlOracle(Map.empty, Map.empty)
    o.submit(sub("https://a.com/x", priority = 5, at = 100))
    o.submit(sub("https://a.com/x", priority = 7, at = 50))
    o.submit(sub("https://a.com/x", priority = 3, at = 200))
    val r = o.frontier.values.head
    assert(r.priority == 7)
    assert(r.nextFetchAt == 50)
    assert(o.frontier.size == 1)
  }

  test("Submit: fetched/dead rows are never re-queued") {
    val o = new CrawlOracle(corpus(page("https://a.com/")), Map.empty)
    o.submitSeeds(Seq(Seed("https://a.com/", "s")))
    o.runDrain()
    val r = o.frontier.values.head
    assert(r.status == FrontierStatus.Fetched)
    o.submit(sub("https://a.com/", priority = 9))
    assert(o.frontier.values.head.status == FrontierStatus.Fetched)
    assert(o.frontier.values.head.priority == 5)
  }

  test("Claim: highest priority first, next_fetch_at then url_hash tie-breaks") {
    val o = new CrawlOracle(
      corpus(page("https://a.com/hi"), page("https://b.com/lo"),
        page("https://c.com/mid")),
      Map.empty)
    o.submit(sub("https://b.com/lo", priority = 3))
    o.submit(sub("https://a.com/hi", priority = 9))
    o.submit(sub("https://c.com/mid", priority = 5))
    o.runDrain()
    // distinct hosts → all claimable in batch 1; order by priority desc
    assert(o.claimLog.map(_.priority).take(3) == Seq(9, 5, 3))
    assert(o.claimLog.head.url == "https://a.com/hi")
  }

  test("politeness: same host claimed at most once per delay window") {
    val urls = (1 to 4).map(i => s"https://one.com/p$i")
    val o = new CrawlOracle(corpus(urls.map(u => page(u)): _*), Map.empty)
    urls.foreach(u => o.submit(sub(u)))
    val clocks = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (o.step()) clocks += o.clock
    // one URL per batch; consecutive batch clocks ≥ min_delay apart
    assert(o.claimLog.size == 4)
    assert(o.claimLog.map(_.batch_id).distinct.size == 4)
    clocks.toSeq.sliding(2).foreach { w =>
      if (w.size == 2) assert(w(1) - w(0) >= CrawlDefaults.MinDelayMs)
    }
  }

  test("UpdateFailed: exponential backoff, dead at max retries, keeps next_fetch_at") {
    // URL not in corpus → fetch_error each attempt
    val o = new CrawlOracle(Map.empty, Map.empty)
    o.submit(sub("https://gone.com/x"))
    o.runDrain()
    val r = o.frontier.values.head
    assert(r.status == FrontierStatus.Dead)
    assert(r.retryCount == CrawlDefaults.MaxRetries)
    assert(r.lastError.contains("fetch_error"))
    // 3 claims: initial, +1min, +2min
    assert(o.claimLog.size == 3)
  }

  test("robots: disallowed URL dead(robots_blocked), no politeness update") {
    val robots = Map("a.com" -> RobotsRow("a.com",
      "User-agent: *\nDisallow: /private/\n", 200))
    val o = new CrawlOracle(
      corpus(page("https://a.com/private/x"), page("https://a.com/ok")),
      robots)
    o.submit(sub("https://a.com/private/x", priority = 9))
    o.submit(sub("https://a.com/ok", priority = 5))
    o.runDrain()
    val byUrl = o.frontier.values.map(r => r.url -> r).toMap
    assert(byUrl("https://a.com/private/x").status == FrontierStatus.Dead)
    assert(byUrl("https://a.com/private/x").lastError.contains("robots_blocked"))
    assert(byUrl("https://a.com/ok").status == FrontierStatus.Fetched)
    // robots-blocked claim did not update host_state → /ok claimable in batch 2
    // (both claims land in consecutive batches at the SAME clock)
    assert(o.claimLog.map(_.batch_id) == Seq(1, 2))
  }

  test("redirect: final URL re-keys the row; collision falls back") {
    val target = page("https://a.com/final")
    val mover = page("https://a.com/old", status = 301,
      redirect = "https://a.com/final")
    val o = new CrawlOracle(corpus(target, mover), Map.empty)
    o.submit(sub("https://a.com/old"))
    o.runDrain()
    // re-key succeeded: row now keyed by final URL's hash
    assert(o.frontier.keySet == Set(UrlNormalizer.sha256Hex("https://a.com/final")))
    assert(o.frontier.values.head.url == "https://a.com/final")

    // now with the target already present → collision → fallback keeps old key
    val o2 = new CrawlOracle(corpus(target, mover), Map.empty)
    o2.submit(sub("https://a.com/final", priority = 1))
    o2.submit(sub("https://a.com/old", priority = 9))
    o2.runDrain()
    assert(o2.frontier.contains(UrlNormalizer.sha256Hex("https://a.com/old")))
    assert(o2.frontier(UrlNormalizer.sha256Hex("https://a.com/old")).status ==
      FrontierStatus.Fetched)
  }

  test("status dispatch: 404 dead, 429/500 retry, 304 fetched without content") {
    val o = new CrawlOracle(corpus(
      page("https://a.com/gone", status = 404),
      page("https://b.com/busy", status = 429),
      page("https://c.com/err", status = 500),
      page("https://d.com/cached", status = 304),
      page("https://e.com/pdfish", ct = "application/pdf"),
      page("https://f.com/file.pdf"),
      page("https://g.com/broken", extractOk = false)
    ), Map.empty)
    Seq("https://a.com/gone", "https://b.com/busy", "https://c.com/err",
      "https://d.com/cached", "https://e.com/pdfish", "https://f.com/file.pdf",
      "https://g.com/broken").foreach(u => o.submit(sub(u)))
    o.runDrain()
    val byUrl = o.frontier.values.map(r => r.url -> r).toMap
    assert(byUrl("https://a.com/gone").lastError.contains("not_found"))
    assert(byUrl("https://b.com/busy").status == FrontierStatus.Dead) // 3 retries
    assert(byUrl("https://b.com/busy").lastError.contains("http status 429"))
    assert(byUrl("https://c.com/err").lastError.contains("http status 500"))
    assert(byUrl("https://d.com/cached").status == FrontierStatus.Fetched)
    assert(byUrl("https://d.com/cached").contentHash.isEmpty)
    assert(byUrl("https://d.com/cached").fetchCount == 1)
    assert(byUrl("https://e.com/pdfish").lastError.contains("unsupported_content_type"))
    assert(byUrl("https://f.com/file.pdf").lastError.contains("binary_url"))
    assert(byUrl("https://g.com/broken").lastError.contains("extract_failed"))
  }

  test("link discovery: depth, priority bonus for content URLs, dedup variants") {
    val root = page("https://a.com/", links = Seq(
      "/news/2024/05/big-local-story-here", // content URL → priority 6
      "/plain", // priority 5
      "HTTP://A.COM:80/plain?utm_source=x", // same as /plain after normalize
      "mailto:x@y.z" // skipped
    ))
    val o = new CrawlOracle(corpus(root,
      page("https://a.com/news/2024/05/big-local-story-here"),
      page("https://a.com/plain")), Map.empty)
    o.submitSeeds(Seq(Seed("https://a.com/", "s")))
    o.runDrain()
    val byUrl = o.frontier.values.map(r => r.url -> r).toMap
    assert(o.frontier.size == 3) // root + 2 distinct discoveries
    assert(byUrl("https://a.com/news/2024/05/big-local-story-here").priority == 6)
    assert(byUrl("https://a.com/plain").priority == 5)
    assert(byUrl("https://a.com/plain").depth == 1)
    assert(byUrl("https://a.com/plain").origin == FrontierOrigin.Spider)
    assert(byUrl("https://a.com/plain").parentUrl.contains("https://a.com/"))
    // higher priority claimed first in batch 2
    val batch2 = o.claimLog.filter(_.batch_id == 2)
    assert(batch2.head.url == "https://a.com/news/2024/05/big-local-story-here")
  }
}
