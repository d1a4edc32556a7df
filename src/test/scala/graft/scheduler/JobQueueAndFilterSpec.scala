package graft.scheduler

import graft.core.UrlFilter
import graft.state.SnapshotStore
import org.scalatest.funsuite.AnyFunSuite

class JobQueueAndFilterSpec extends AnyFunSuite {

  private def job(id: String, status: String = JobStateMachine.Scheduled,
      nextRunAt: Option[Long] = Some(100L), immediate: Boolean = false,
      locked: Boolean = false, paused: Boolean = false) =
    Job(id, status, paused, if (locked) Some("t") else None,
      if (locked) Some(50L) else None, nextRunAt, immediate)

  test("readyJobs: filters + immediate-first, nulls-last ordering (J1)") {
    val jobs = Seq(
      job("due-late", nextRunAt = Some(90L)),
      job("due-early", nextRunAt = Some(10L)),
      job("immediate", nextRunAt = None, immediate = true),
      job("future", nextRunAt = Some(500L)),
      job("locked", locked = true),
      job("paused", paused = true),
      job("running", status = JobStateMachine.Running),
      job("null-imm", nextRunAt = None, immediate = true)
    )
    val ready = JobQueue.readyJobs(jobs, now = 100L)
    assert(ready.map(_.id) == Seq("immediate", "null-imm", "due-early", "due-late"))
    assert(JobQueue.readyJobs(jobs, 100L, limit = 2).size == 2)
  }

  test("CAS lock: acquire only when free; stale locks cleared (J2)") {
    val j = job("a")
    val Some(locked) = JobQueue.acquireLock(j, "tok1", 10L): @unchecked
    assert(locked.lockToken.contains("tok1"))
    assert(JobQueue.acquireLock(locked, "tok2", 11L).isEmpty)
    assert(JobQueue.releaseLock(locked, "wrong").isEmpty)
    assert(JobQueue.releaseLock(locked, "tok1").exists(_.lockToken.isEmpty))
    val cleared = JobQueue.clearStaleLocks(Seq(locked), cutoff = 20L)
    assert(cleared.head.lockToken.isEmpty)
    val kept = JobQueue.clearStaleLocks(Seq(locked), cutoff = 5L)
    assert(kept.head.lockToken.contains("tok1"))
  }

  test("B2 shouldSkipUrl: hosts, CDN paths, binary ext, e-commerce segments") {
    assert(UrlFilter.shouldSkipUrl("https://play.google.com/store/apps"))
    assert(UrlFilter.shouldSkipUrl("https://d1.cloudfront.net/x"))
    assert(UrlFilter.shouldSkipUrl("https://x.com/wp-content/uploads/img"))
    assert(UrlFilter.shouldSkipUrl("https://x.com/assets/app.js"))
    assert(UrlFilter.shouldSkipUrl("https://x.com/pic.PNG"))
    assert(UrlFilter.shouldSkipUrl("https://x.com/shop/item-1"))
    assert(UrlFilter.shouldSkipUrl("https://x.com/tag/news"))
    assert(!UrlFilter.shouldSkipUrl("https://x.com/news/local-story"))
    // off-source-host check only when sourceHost given
    assert(UrlFilter.shouldSkipUrl("https://other.com/a", "x.com"))
    assert(!UrlFilter.shouldSkipUrl("https://x.com/a", "x.com"))
    assert(UrlFilter.shouldSkipUrl("://bad"))
  }

  test("B3 detectContentTypeFromUrl: first pattern wins; pdf => report") {
    assert(UrlFilter.detectContentTypeFromUrl("https://x.com/press/release-1") == "press_release")
    assert(UrlFilter.detectContentTypeFromUrl("https://x.com/events/fair") == "event")
    assert(UrlFilter.detectContentTypeFromUrl("https://x.com/city/arrests/march") == "blotter")
    assert(UrlFilter.detectContentTypeFromUrl("https://x.com/careers/dev") == "job")
    assert(UrlFilter.detectContentTypeFromUrl("https://x.com/annual.pdf") == "report")
    assert(UrlFilter.detectContentTypeFromUrl("https://x.com/plain/page") == "")
  }

  test("B3 JSON-LD / og:type detection (content_detector.go:330-387)") {
    import UrlFilter._
    assert(detectContentTypeFromJsonLd(
      Seq("""{"@type":"NewsArticle","headline":"x"}""")) == "article")
    assert(detectContentTypeFromJsonLd(Seq("""{ "@type": "Event" }""")) == "event")
    assert(detectContentTypeFromJsonLd(Seq("", " ", """{"@type":"Recipe"}""")) == "")
    // first script with a collectible type wins
    assert(detectContentTypeFromJsonLd(
      Seq("""{"@type":"BlogPosting"}""", """{"@type":"Event"}""")) == "blog_post")
    // precedence: JSON-LD > URL patterns > og:type=article
    assert(detectContentTypeFromHtml(Seq("""{"@type":"Report"}"""),
      "article", "https://x.com/events/e") == "report")
    assert(detectContentTypeFromHtml(Nil, "", "https://x.com/events/e") == "event")
    assert(detectContentTypeFromHtml(Nil, "Article", "https://x.com/plain") == "article")
    assert(detectContentTypeFromHtml(Nil, "website", "https://x.com/plain") == "")
    // .pdf beats the pattern table (content_detector.go:317-319)
    assert(detectContentTypeFromUrl("https://x.com/events/brochure.pdf") == "report")
    // collector gate falls back to the content-URL heuristic as article
    assert(isStructuredContentPage(Nil, "",
      "https://x.com/2026/02/14/big-headline") == ((true, "article")))
    assert(isStructuredContentPage(Nil, "", "https://x.com/x") == ((false, "")))
    // corpus news pages carry a JSON-LD span the detector classifies
    val p = graft.corpus.CorpusParams(numHosts = 3, pagesPerHost = 20)
    val newsPages = graft.corpus.Corpus.allPages(p)
      .filter(_.url.contains("/news/"))
    assert(newsPages.nonEmpty)
    newsPages.foreach { pg =>
      val scripts = pg.spans.filter(_.kind == "jsonld").map(_.text)
      assert(scripts.nonEmpty)
      assert(isStructuredContentPage(scripts, "", pg.url) == ((true, "article")))
    }
  }

  test("snapshot vacuum keeps live carry-forward state, drops dead versions") {
    val dir = java.nio.file.Files.createTempDirectory("vac").toString
    val store = new SnapshotStore(dir)
    def mkData(name: String): String = {
      val p = java.nio.file.Paths.get(store.dataPath(name))
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.writeString(p.resolve("part-0.parquet"), "x")
      p.toString
    }
    // v0: buckets 0,1 (pending+settled leaves); v1 rewrites bucket 0 only
    // (bucket 1 carries forward)
    val b0v0 = mkData("frontier_v0/bucket_p=0/pend_p=true")
    val b1v0 = mkData("frontier_v0/bucket_p=1/pend_p=true")
    val h0 = mkData("host_state_v0")
    store.commit(store.Manifest(0, 0L, Map("0/p" -> b0v0, "1/p" -> b1v0),
      Map("host_state" -> h0)))
    val b0v1 = mkData("frontier_v1/bucket_p=0/pend_p=true")
    val h1 = mkData("host_state_v1")
    store.commit(store.Manifest(1, 1L, Map("0/p" -> b0v1, "1/p" -> b1v0),
      Map("host_state" -> h1)))

    val removed = store.vacuum(keepLast = 1)
    assert(removed >= 2) // v0 bucket 0 + host_state_v0
    // carried-forward bucket 1 of v0 must survive
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(b1v0)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(b0v0)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(h0)))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(b0v1)))
    // latest manifest still resolves
    assert(store.latest().exists(_.batchId == 1))
  }

  test("snapshot vacuum prunes superseded curation-table versions (_c dirs)") {
    val dir = java.nio.file.Files.createTempDirectory("vac-c").toString
    val store = new SnapshotStore(dir)
    def mkData(name: String): String = {
      val p = java.nio.file.Paths.get(store.dataPath(name))
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.writeString(p.resolve("part-0.parquet"), "x")
      p.toString
    }
    val f0 = mkData("frontier_v0/bucket_p=0/pend_p=true")
    val s1 = mkData("sources_c1")
    val d1 = mkData("domain_states_c1")
    store.commit(store.Manifest(0, 0L, Map("0/p" -> f0),
      Map("sources" -> s1, "domain_states" -> d1)))
    // next upsert rewrites sources under a new version; domain_states
    // carries forward
    val s2 = mkData("sources_c2")
    store.commit(store.Manifest(1, 1L, Map("0/p" -> f0),
      Map("sources" -> s2, "domain_states" -> d1)))

    val removed = store.vacuum(keepLast = 1)
    assert(removed >= 1) // sources_c1
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s1)),
      "superseded sources_c1 pruned")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s2)))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d1)),
      "carried-forward domain_states_c1 survives")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(f0)))
  }
}
