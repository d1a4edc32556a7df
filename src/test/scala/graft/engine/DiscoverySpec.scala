package graft.engine

import graft.SparkTestBase
import graft.core._
import graft.corpus.Corpus
import graft.state.SnapshotStore
import org.scalatest.funsuite.AnyFunSuite

class DiscoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("substring block/allow filters (discovery/pipeline.go:343-367)") {
    assert(Discovery.isBlocked("https://x.com/casino/page", Seq("casino", "spam")))
    assert(!Discovery.isBlocked("https://x.com/news", Seq("casino", " ", "")))
    assert(Discovery.isAllowlisted("https://x.com/anything", Nil))
    assert(Discovery.isAllowlisted("https://x.com/news/a", Seq("news")))
    assert(!Discovery.isAllowlisted("https://x.com/shop/a", Seq("news")))
  }

  test("discover: normalize, filter, dedup vs frontier, budget gate") {
    val frontier = Seq(FrontierUrl("https://a.com/seen",
      UrlNormalizer.sha256Hex("https://a.com/seen"), "a.com", "s",
      FrontierOrigin.Manual, None, 0, 5, FrontierStatus.Fetched,
      0L, None, 1, None, None, None, 0, None, 0L, 0L, 0L, 0)).toDS()
    val cands = Seq(
      Discovery.Candidate("HTTP://A.com/seen?utm_source=x", "s"), // dup of seen
      Discovery.Candidate("https://a.com/new-1", "s"),
      Discovery.Candidate("https://a.com/new-2?z=1&a=2", "s"),
      Discovery.Candidate("https://a.com/casino/blocked", "s"),
      Discovery.Candidate("nonsense-url", "s"),
      Discovery.Candidate("https://a.com/new-1#frag", "s") // in-batch dup
    ).toDS()
    val out = Discovery.discover(spark, cands, frontier,
      blocklist = Seq("casino"), allowlist = Nil,
      dailyBudget = 10, usedToday = 0, now = 42L).collect()
    assert(out.map(_.url).toSet == Set("https://a.com/new-1", "https://a.com/new-2?a=2&z=1"))
    assert(out.forall(s => s.origin == FrontierOrigin.Discovered &&
      s.priority == 5 && s.depth == 0 && s.next_fetch_at == 42L))
    // budget cuts deterministically
    val cut = Discovery.discover(spark, cands, frontier, Seq("casino"), Nil,
      dailyBudget = 1, usedToday = 0, now = 42L).collect()
    assert(cut.length == 1)
    val none = Discovery.discover(spark, cands, frontier, Seq("casino"), Nil,
      dailyBudget = 5, usedToday = 5, now = 42L).collect()
    assert(none.isEmpty)
  }

  test("F6 identity keys: platform tenants and host default (resolver.go:122-173)") {
    assert(Discovery.identityKey("https://substack.com/foo/post")
      == Right(("substack:foo", "platform substack tenant from path")))
    assert(Discovery.identityKey("https://medium.com/@bar/story")
      == Right(("medium:bar", "platform medium tenant from path")))
    // medium without @author → empty tenant; substack subdomain → host default
    assert(Discovery.identityKey("https://medium.com/topic/x").map(_._1)
      == Right("medium:"))
    assert(Discovery.identityKey("https://example.substack.com/p/x").map(_._1)
      == Right("example.substack.com"))
    assert(Discovery.identityKey("https://News.Example.ORG/a").map(_._1)
      == Right("news.example.org"))
  }

  test("F6 enrichment rules: category, template hint, risk score, robots precheck") {
    assert(Discovery.inferCategory("https://x.com/news/today", "") == "news")
    assert(Discovery.inferCategory("https://x.com/a", "Daily News Digest") == "news")
    assert(Discovery.inferCategory("https://x.com/blog/post", "") == "blog")
    assert(Discovery.inferCategory("https://x.com/store/item", "") == "commerce")
    assert(Discovery.inferCategory("https://x.com/misc", "plain title") == "blog")
    assert(Discovery.inferTemplateHint("foo.substack.com") == "substack")
    assert(Discovery.inferTemplateHint("medium.com") == "medium")
    assert(Discovery.inferTemplateHint("myblog.wordpress.com") == "wordpress")
    assert(Discovery.inferTemplateHint("example.org") == "")
    // risk: spam 0.5 + minimal metadata 0.1; capped at 1.0
    assert(Discovery.riskScore("https://x.com/casino-wins", "", "", adultContent = false)
      == ((0.6, Seq("url_spam_indicator", "minimal_metadata"))))
    assert(Discovery.riskScore("https://x.com/ok", "Title", "fav.ico", adultContent = false)
      == ((0.0, Nil)))
    val (capped, _) = Discovery.riskScore("https://x.com/viagra", "", "", adultContent = true)
    assert(capped == 1.0)
    // robots precheck: only a literal block-all line in a 200 body blocks
    assert(!Discovery.robotsPrecheckAllowed("User-agent: *\nDisallow: /\n", 200))
    assert(Discovery.robotsPrecheckAllowed("User-agent: *\nDisallow: /x\n", 200))
    assert(Discovery.robotsPrecheckAllowed("Disallow: /", 404))
  }

  test("F6 resolve→dedup→enrich→persist + approved-candidate processing") {
    def sub(u: String) = Submission(u, UrlNormalizer.sha256Hex(u),
      GoUrl.parse(u).map(_.hostname).getOrElse(""), "ref-src",
      FrontierOrigin.Discovered, None, 0, 5, 100L)
    val normalized = Seq(
      sub("https://known.example.org/start"), // existing source
      sub("https://substack.com/alice/hello"), // platform sub candidate
      sub("https://fresh.example.org/news/x"), // new candidate with meta
      sub("https://fresh.example.org/news/y"), // same identity → one candidate
      sub("https://pendingalready.example.org/a"), // pending identity → dropped
      sub("https://blocked.example.org/a"), // robots block-all → dropped
      sub("https://casino.example.org/win") // kept but risk-scored
    ).toDS()
    val existing = Seq(("known.example.org", "src-KNOWN")).toDS()
    val pending = Seq("pendingalready.example.org").toDS()
    val meta = Seq(("https://fresh.example.org/news/x",
      "Fresh News", "https://fresh.example.org/favicon.ico")).toDS()
    val (submits, cands) = Discovery.resolveEnrichCandidates(spark, normalized,
      existing, pending, meta, Set("blocked.example.org"),
      maxCandidates = 0, now = 100L)
    val subOut = submits.collect()
    assert(subOut.map(_.url).toSeq == Seq("https://known.example.org/start"))
    assert(subOut.head.source_id == "src-KNOWN")
    val byKey = cands.collect().map(c => c.identity_key -> c).toMap
    assert(byKey.keySet == Set("substack:alice", "fresh.example.org",
      "casino.example.org"))
    assert(byKey("substack:alice").kind == "platform_sub")
    assert(byKey("substack:alice").template_hint == "substack")
    val fresh = byKey("fresh.example.org")
    assert(fresh.kind == "new" && fresh.title == "Fresh News" &&
      fresh.category == "news" && fresh.risk_score == 0.0 &&
      fresh.canonical_url == "https://fresh.example.org/news/x") // min URL
    assert(byKey("casino.example.org").risk_score == 0.6)
    assert(byKey("casino.example.org").risk_reasons ==
      Seq("url_spam_indicator", "minimal_metadata"))
    // candidate cap keeps the first N by canonical URL
    val (_, capped) = Discovery.resolveEnrichCandidates(spark, normalized,
      existing, pending, meta, Set("blocked.example.org"),
      maxCandidates = 1, now = 100L)
    assert(capped.collect().map(_.canonical_url).toSeq ==
      Seq("https://casino.example.org/win"))

    // approval: approved rows become sources + frontier seeds, move to processing
    val approved = cands.map(c =>
      if (c.identity_key == "fresh.example.org") c.copy(status = "approved") else c)
    val (sources, seeds, updated) =
      Discovery.processApprovedCandidates(spark, approved, now = 200L)
    val src = sources.collect()
    assert(src.length == 1 && src.head.identity_key == "fresh.example.org")
    val seed = seeds.collect()
    assert(seed.length == 1 && seed.head.source_id == src.head.source_id &&
      seed.head.origin == FrontierOrigin.Discovered && seed.head.depth == 0)
    assert(updated.collect().count(_.status == "processing") == 1)
    assert(updated.collect().count(_.status == "pending") == 2)
  }

  test("engine read side: frontierStats + frontierList filters/paging (R1/R2)") {
    val (pages, robots, seeds) = Corpus.fixtureNewsSite()
    val store = new SnapshotStore(
      java.nio.file.Files.createTempDirectory("reads").toString)
    val e = new CrawlEngine(spark, store, spark.createDataset(pages), robots,
      EngineConfig(numBuckets = 4, maxDepth = 5))
    e.seed(seeds)
    e.runDrain()
    assert(e.frontierStats() == Map(FrontierStatus.Fetched -> 3L))
    val all = e.frontierList(limit = 10)
    assert(all.count() == 3)
    val searched = e.frontierList(search = Some("ROBBERY"), limit = 10).collect()
    assert(searched.length == 1 &&
      searched.head.url.contains("downtown-robbery-arrests"))
    val paged = e.frontierList(limit = 1, offset = 1).collect()
    assert(paged.length == 1)
    assert(e.frontierList(host = Some("nope.com"), limit = 10).count() == 0)
    assert(Discovery.countByOriginSince(e.frontier(), FrontierOrigin.Spider, 0L) == 2)
  }
}
