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
