package graft.engine

import graft.SparkTestBase
import graft.core._
import graft.corpus.Corpus
import graft.state.SnapshotStore
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** R3/R5 over the discovered_links table: NULL-aware ratio semantics
  * (domain_aggregate_repository.go:307-323) and the engine-level views.
  */
class DomainViewsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def linkRow(dom: String, src: String, depth: Int,
      http: Option[Int], ct: Option[String], at: Long) =
    (src, src, s"https://$dom/p$at", s"h-$dom-$src-$at", None: Option[String],
      depth, dom, http, ct, at, at, "pending", 0)

  private def linksDf(rows: Seq[(String, String, String, String,
      Option[String], Int, String, Option[Int], Option[String], Long, Long,
      String, Int)]) =
    rows.toDF("source_id", "source_name", "url", "url_hash", "parent_url",
      "depth", "domain", "http_status", "content_type", "discovered_at",
      "updated_at", "status", "priority")

  test("aggregate: counts, avg depth, NULL-aware ok/html ratios, state join") {
    val links = linksDf(Seq(
      // d1: mixed statuses — 2 of 3 rows have http_status, 1 is 2xx
      linkRow("d1", "s1", 1, Some(200), Some("text/html; charset=utf-8"), 10L),
      linkRow("d1", "s2", 3, Some(500), Some("application/json"), 20L),
      linkRow("d1", "s1", 2, None, None, 30L),
      // d2: spider path — no statuses at all → NULL ratios
      linkRow("d2", "s1", 0, None, None, 5L)))
    val states = Seq(("d2", "blocked", "manually parked"))
      .toDF("domain", "status", "notes")
    val out = DomainViews.aggregate(spark, links, Some(states))
      .collect().map(r => r.getAs[String]("domain") -> r).toMap

    val d1 = out("d1")
    assert(d1.getAs[Long]("link_count") == 3L)
    assert(d1.getAs[Long]("source_count") == 2L)
    assert(math.abs(d1.getAs[Double]("avg_depth") - 2.0) < 1e-9)
    assert(d1.getAs[Long]("first_seen") == 10L && d1.getAs[Long]("last_seen") == 30L)
    assert(math.abs(d1.getAs[Double]("ok_ratio") - 0.5) < 1e-9) // 1 of 2 WITH status
    assert(math.abs(d1.getAs[Double]("html_ratio") - 0.5) < 1e-9)
    assert(d1.getAs[String]("status") == "active" && d1.getAs[String]("notes") == null)

    val d2 = out("d2")
    assert(d2.isNullAt(d2.fieldIndex("ok_ratio")), "no statuses → NULL ratio")
    assert(d2.isNullAt(d2.fieldIndex("html_ratio")))
    assert(d2.getAs[String]("status") == "blocked")
    assert(d2.getAs[String]("notes") == "manually parked")
  }

  test("aggregate: HAVING-style min link count + ordering + paging") {
    val links = linksDf((1 to 5).map(i =>
      linkRow("big", s"s$i", 1, None, None, i.toLong)) ++
      Seq(linkRow("small", "s1", 1, None, None, 1L)))
    val all = DomainViews.aggregate(spark, links).collect()
    assert(all.map(_.getAs[String]("domain")).toSeq == Seq("big", "small"))
    val filtered = DomainViews.aggregate(spark, links, minLinkCount = 2)
    assert(filtered.collect().map(_.getAs[String]("domain")).toSeq == Seq("big"))
    val page2 = DomainViews.aggregate(spark, links, limit = 1, offset = 1)
    assert(page2.collect().map(_.getAs[String]("domain")).toSeq == Seq("small"))
  }

  test("engine views: discoveredLinks upsert + linksByDomain paging") {
    // two hosts; h1's page links to h2 twice across batches (re-discovery
    // updates parent/depth, keeps first discovered_at)
    val h1 = "dv-a.example.org"; val h2 = "dv-b.example.org"
    def pg(host: String, path: String, links: Seq[String]) = {
      val url = Corpus.canonicalUrl(host, path)
      PageRow(UrlNormalizer.sha256Hex(url), url, UrlNormalizer.sha256Hex(url),
        host, 200, "", "text/html; charset=utf-8", "", extract_ok = true,
        Seq(Span("text", s"p $path", "", 0)), links)
    }
    val target = Corpus.canonicalUrl(h2, "/t")
    val pages = Seq(
      pg(h1, "/", Seq("/second", target)),
      pg(h1, "/second", Seq(target)), // re-discovers target at depth 2
      pg(h2, "/t", Nil))
    val store = new SnapshotStore(Files.createTempDirectory("dv").toString)
    val e = new CrawlEngine(spark, store, spark.createDataset(pages), Nil,
      EngineConfig(numBuckets = 8, maxDepth = 4))
    e.seed(Seq(Seed(Corpus.canonicalUrl(h1, "/"), "src-1")))
    e.runDrain()

    val dl = e.discoveredLinks().collect()
    val tRow = dl.find(_.getAs[String]("url") == target).get
    // upsert: latest write's parent/depth win; discovered_at is the first
    assert(tRow.getAs[Int]("depth") == 2)
    assert(tRow.getAs[String]("parent_url").contains("/second"))
    assert(tRow.getAs[Long]("discovered_at") < tRow.getAs[Long]("updated_at"))

    val agg = e.domainAggregates().collect()
      .map(r => r.getAs[String]("domain") -> r.getAs[Long]("link_count")).toMap
    assert(agg(h2) == 1L) // one distinct link despite two discoveries
    assert(agg(h1) == 1L) // /second

    val (rows, total) = e.linksByDomain(h2)
    assert(total == 1L && rows.collect().length == 1)
    val (none, zero) = e.linksByDomain("nosuch.example.org")
    assert(zero == 0L && none.collect().isEmpty)
  }

  test("persisted domain states: upsert semantics, aggregate pickup, resume") {
    val h1 = "ds-a.example.org"; val h2 = "ds-b.example.org"
    def pg(host: String, path: String, links: Seq[String]) = {
      val url = Corpus.canonicalUrl(host, path)
      PageRow(UrlNormalizer.sha256Hex(url), url, UrlNormalizer.sha256Hex(url),
        host, 200, "", "text/html; charset=utf-8", "", extract_ok = true,
        Seq(Span("text", s"p $path", "", 0)), links)
    }
    val pages = Seq(
      pg(h1, "/", Seq(Corpus.canonicalUrl(h2, "/x"))),
      pg(h2, "/x", Nil))
    val dir = Files.createTempDirectory("ds").toString
    val e = new CrawlEngine(spark, new SnapshotStore(dir),
      spark.createDataset(pages), Nil, EngineConfig(numBuckets = 8, maxDepth = 3))
    e.seed(Seq(Seed(Corpus.canonicalUrl(h1, "/"), "src-1")))
    e.runDrain()

    // bulk upsert: ignored with notes; status timestamp stamped
    assert(e.upsertDomainStates(Seq(h2), "ignored", Some("spam farm")) == 1L)
    val s1 = e.domainStates().collect().head
    assert(s1.domain == h2 && s1.status == "ignored")
    assert(s1.notes.contains("spam farm") && s1.ignored_at.isDefined)
    assert(s1.promoted_at.isEmpty)
    val created = s1.created_at

    // re-upsert to promoted: created_at kept, promoted_at stamped,
    // ignored_at carried (the reference never clears old timestamps)
    assert(e.upsertDomainStates(Seq(h2), "promoted") == 1L)
    val s2 = e.domainStates().collect().head
    assert(s2.status == "promoted" && s2.created_at == created)
    assert(s2.promoted_at.isDefined && s2.ignored_at.isDefined)
    assert(s2.notes.isEmpty, "notes take the new (absent) value")

    // domainAggregates reads the PERSISTED states by default now
    val agg = e.domainAggregates().collect()
      .map(r => r.getAs[String]("domain") -> r.getAs[String]("status")).toMap
    assert(agg(h2) == "promoted")

    // resume: a fresh engine loads the persisted table via the manifest
    val e2 = new CrawlEngine(spark, new SnapshotStore(dir),
      spark.createDataset(pages), Nil, EngineConfig(numBuckets = 8, maxDepth = 3))
    assert(e2.resume())
    assert(e2.domainStates().collect().toSeq == e.domainStates().collect().toSeq)
  }

  test("source registry: links carry resolved names; engine ≡ oracle; resume") {
    val h1 = "sr-a.example.org"; val h2 = "sr-b.example.org"
    def pg(host: String, path: String, links: Seq[String]) = {
      val url = Corpus.canonicalUrl(host, path)
      PageRow(UrlNormalizer.sha256Hex(url), url, UrlNormalizer.sha256Hex(url),
        host, 200, "", "text/html; charset=utf-8", "", extract_ok = true,
        Seq(Span("text", s"p $path", "", 0)), links)
    }
    val pages = Seq(
      pg(h1, "/", Seq("/a", Corpus.canonicalUrl(h2, "/t"))),
      pg(h1, "/a", Nil), pg(h2, "/t", Nil))
    val reg = Map("src-1" -> "Example News Network")
    val dir = Files.createTempDirectory("sr").toString
    val e = new CrawlEngine(spark, new SnapshotStore(dir),
      spark.createDataset(pages), Nil, EngineConfig(numBuckets = 8, maxDepth = 3))
    e.registerSources(reg.toSeq.map { case (id, n) => SourceEntry(id, n) })
    e.seed(Seq(Seed(Corpus.canonicalUrl(h1, "/"), "src-1")))
    e.runDrain()

    val names = e.discoveredLinks().collect()
      .map(_.getAs[String]("source_name")).toSet
    assert(names == Set("Example News Network"), s"resolved names: $names")

    // oracle with the same registry agrees on every link field
    val o = new graft.oracle.CrawlOracle(pages.map(p => p.url_hash -> p).toMap,
      Map.empty, maxDepth = 3, sources = reg)
    o.submitSeeds(Seq(Seed(Corpus.canonicalUrl(h1, "/"), "src-1")))
    o.runDrain()
    val on = o.links.values.map(_.sourceName).toSet
    assert(on == Set("Example News Network"))

    // registry survives resume
    val e2 = new CrawlEngine(spark, new SnapshotStore(dir),
      spark.createDataset(pages), Nil, EngineConfig(numBuckets = 8, maxDepth = 3))
    assert(e2.resume())
    assert(e2.sources().collect().toSeq == Seq(SourceEntry("src-1", "Example News Network")))
  }
}
