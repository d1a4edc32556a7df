package graft.oracle

import graft.core._
import scala.collection.mutable

/** Single-threaded executable model of the reference's crawl semantics —
  * the ordering + seen-set oracle the Spark engine is tested against
  * (SURVEY.md §5.2.2).
  *
  * The reference's `LIMIT 1 … FOR UPDATE SKIP LOCKED` with 16 racing
  * workers is nondeterministic in wall-clock interleaving; the DEFINED
  * order — priority DESC, next_fetch_at ASC with the politeness predicate
  * (database/frontier_repository.go:151-161) — is deterministic once a
  * tie-break (url_hash ASC) and a virtual batch clock are fixed
  * (SURVEY.md §7.4.1). The oracle linearizes each micro-batch as:
  *
  *   1. claim the top-1 eligible URL per host (≤1/host per politeness
  *      window), globally ordered by (priority DESC, next_fetch_at ASC,
  *      url_hash ASC) — the claim log;
  *   2. process every claim's outcome in claim order (fetch via corpus
  *      lookup, redirects, status dispatch per fetcher/worker.go:308-437,
  *      retry/backoff per frontier_repository.go:267-286);
  *   3. apply every discovered-link submission in (claim seq, link index)
  *      order with the reference's upsert semantics
  *      (frontier_repository.go:58-79: insert new; pending duplicates
  *      merge priority=GREATEST, next_fetch_at=LEAST; fetched/dead
  *      never re-queued);
  *   4. advance the virtual clock to the earliest next eligibility.
  */
final class CrawlOracle(
    pages: Map[String, PageRow], // by url_hash of canonical URL
    robotsByHost: Map[String, RobotsRow],
    userAgent: String = "graft-bot",
    maxRetries: Int = CrawlDefaults.MaxRetries,
    maxRedirects: Int = CrawlDefaults.MaxRedirects,
    maxDepth: Int = 3,
    /** B2 pre-submit URL filter (crawler/collector.go:443-450 aborts
      * these before any fetch; url_filter.go:38-65). None = off.
      */
    preSubmitFilter: Option[String => Boolean] = None,
    /** Source registry (source_id → display name; link_handler.go:396
      * `cc.Source.Name`). Unregistered ids fall back to the id.
      */
    sources: Map[String, String] = Map.empty,
    /** Keyed robots cache (fetcher/robots.go:19, host_state_repository
      * .go:55-70): per-host robots served from cache until TTL lapses,
      * then re-fetched from the timeline at the current virtual clock.
      * Off = static fixture rules for the whole drain.
      */
    keyedRobots: Boolean = false,
    robotsTtlMs: Long = 24L * 3600L * 1000L,
    robotsUpdates: Seq[(Long, RobotsRow)] = Nil
) {

  final class Row(
      var url: String,
      var urlHash: String,
      var host: String,
      val sourceId: String,
      val origin: String,
      val parentUrl: Option[String],
      val depth: Int,
      var priority: Int,
      var status: String,
      var nextFetchAt: Long,
      var lastFetchedAt: Option[Long],
      var fetchCount: Int,
      var contentHash: Option[String],
      var etag: Option[String],
      var retryCount: Int,
      var lastError: Option[String],
      val discoveredAt: Long
  )

  /** Discovered-link tracking row (domain/discovered_link.go:9-25) with
    * CreateOrUpdate upsert semantics (discovered_link_repository.go:46-59):
    * parent/depth/priority take the LAST write, discoveredAt keeps the
    * first. Keyed (source_id, url_hash); spider-origin submissions only
    * (the reference's saveLinkToQueue runs in the collector's link
    * handler, link_handler.go:384-406).
    */
  final case class OLink(url: String, domain: String, parentUrl: Option[String],
      depth: Int, priority: Int, discoveredAt: Long, updatedAt: Long,
      sourceName: String)

  val frontier: mutable.LinkedHashMap[String, Row] = mutable.LinkedHashMap()
  val links: mutable.LinkedHashMap[(String, String), OLink] = mutable.LinkedHashMap()
  val hostLastFetch: mutable.Map[String, Long] = mutable.Map()
  val hostMinDelay: mutable.Map[String, Long] = mutable.Map()
  val claimLog: mutable.ArrayBuffer[ClaimLogEntry] = mutable.ArrayBuffer()
  /** doc_id → (claimed url, spans of the fetched page) */
  val docs: mutable.LinkedHashMap[String, (String, Seq[Span])] = mutable.LinkedHashMap()
  var clock: Long = CrawlDefaults.VirtualEpochMs
  /** Claim batches are numbered from 1; snapshot 0 is the seeded state. */
  var batchId: Long = 1L

  private val robotsRules: Map[String, RobotsRules] =
    robotsByHost.map { case (h, r) =>
      h -> RobotsRules.fromResponse(r.body, r.status_code, userAgent)
    }

  private val robotsTimeline: Map[String, Seq[(Long, RobotsRow)]] =
    (robotsByHost.values.map(r => (Long.MinValue, r)).toSeq ++ robotsUpdates)
      .groupBy(_._2.host).view.mapValues(_.sortBy(_._1)).toMap

  /** host → (body, status, fetched_at): the keyed robots cache. */
  val hostRobots: mutable.Map[String, (String, Int, Long)] = mutable.Map()

  private def rules(host: String): RobotsRules =
    if (!keyedRobots) robotsRules.getOrElse(host, RobotsRules.AllowAll)
    else {
      val cached = hostRobots.get(host).filter(_._3 + robotsTtlMs > clock)
      val (b, st, _) = cached.getOrElse {
        val row = robotsTimeline.get(host)
          .flatMap(_.takeWhile(_._1 <= clock).lastOption).map(_._2)
        val e = (row.map(_.body).getOrElse(""),
          row.map(_.status_code).getOrElse(404), clock)
        hostRobots(host) = e
        e
      }
      RobotsRules.fromResponse(b, st, userAgent)
    }

  private def minDelay(host: String): Long =
    hostMinDelay.getOrElse(host, CrawlDefaults.MinDelayMs)

  private def hostReadyAt(host: String): Long =
    hostLastFetch.get(host).map(_ + minDelay(host)).getOrElse(Long.MinValue)

  /** Submit with the reference upsert semantics (frontier_repository.go:58-79). */
  def submit(s: Submission): Unit = {
    if (s.origin == FrontierOrigin.Spider) {
      val key = (s.source_id, s.url_hash)
      val first = links.get(key).map(_.discoveredAt).getOrElse(clock)
      links(key) = OLink(s.url, s.host, s.parent_url, s.depth, s.priority,
        first, clock, sources.getOrElse(s.source_id, s.source_id))
    }
    frontier.get(s.url_hash) match {
      case None =>
        frontier.put(s.url_hash, new Row(s.url, s.url_hash, s.host, s.source_id,
          s.origin, s.parent_url, s.depth, s.priority, FrontierStatus.Pending,
          s.next_fetch_at, None, 0, None, None, 0, None, s.next_fetch_at))
      case Some(r) if r.status == FrontierStatus.Pending =>
        r.priority = math.max(r.priority, s.priority)
        r.nextFetchAt = math.min(r.nextFetchAt, s.next_fetch_at)
      case _ => ()
    }
  }

  def submitSeeds(seeds: Seq[Seed]): Unit =
    seeds.foreach { sd =>
      (UrlNormalizer.normalize(sd.url), UrlNormalizer.urlHash(sd.url),
        UrlNormalizer.extractHost(sd.url)) match {
        case (Right(u), Right(h), Right(host)) =>
          submit(Submission(u, h, host, sd.source_id, FrontierOrigin.Manual,
            None, 0, Priorities.Default, clock))
        case _ => ()
      }
    }

  private def pendingRows: Iterable[Row] =
    frontier.values.filter(_.status == FrontierStatus.Pending)

  /** Earliest instant at which any pending row becomes claimable. */
  private def nextEligibilityTime: Option[Long] = {
    val ts = pendingRows.map(r => math.max(r.nextFetchAt, hostReadyAt(r.host)))
    if (ts.isEmpty) None else Some(ts.min)
  }

  private def claimOrdering: Ordering[Row] =
    Ordering.by(r => (-r.priority, r.nextFetchAt, r.urlHash))

  /** Run one micro-batch; returns false when the frontier is drained. */
  def step(): Boolean = {
    nextEligibilityTime match {
      case None => false
      case Some(t) =>
        clock = math.max(clock, t)
        val eligible = pendingRows.filter(r =>
          r.nextFetchAt <= clock && hostReadyAt(r.host) <= clock).toSeq
        if (eligible.isEmpty) return pendingRows.nonEmpty && { clock += 1; true }
        val claims = eligible
          .groupBy(_.host).values
          .map(_.min(claimOrdering))
          .toSeq.sorted(claimOrdering)
        claims.foreach { r =>
          claimLog += ClaimLogEntry(batchId, r.urlHash, r.url, r.host,
            r.priority, r.nextFetchAt)
          r.status = FrontierStatus.Fetching
        }
        val submissions = mutable.ArrayBuffer.empty[Submission]
        claims.foreach(r => submissions ++= processClaim(r))
        submissions.foreach(submit)
        batchId += 1
        true
    }
  }

  def runDrain(maxBatches: Int = 100000): Unit = {
    var n = 0
    while (n < maxBatches && step()) n += 1
  }

  /** Full per-URL state machine (fetcher/worker.go:257-437). */
  private def processClaim(r: Row): Seq[Submission] = {
    // X2 robots gate — before any fetch, no host_state update on block.
    val path = GoUrl.parse(r.url).map(_.path).getOrElse("/")
    if (!rules(r.host).isAllowed(path)) { dead(r, CrawlDefaults.ReasonRobotsBlocked); return Nil }

    // X3 fetch via corpus lookup, following redirects (fetcher/redirect.go:16-23).
    var cur = pages.get(r.urlHash)
    var hops = 0
    var tooMany = false
    var missing = cur.isEmpty
    while (!missing && !tooMany && cur.get.status_code >= 300 &&
      cur.get.status_code < 400 && cur.get.redirect_to.nonEmpty) {
      hops += 1
      if (hops > maxRedirects) tooMany = true
      else {
        val nextHash = UrlNormalizer.sha256Hex(cur.get.redirect_to)
        pages.get(nextHash) match {
          case Some(p) => cur = Some(p)
          case None    => missing = true
        }
      }
    }

    // S2: host_state updated after ANY fetch attempt (worker.go:271-274).
    hostLastFetch(r.host) = clock
    hostMinDelay.getOrElseUpdate(r.host, CrawlDefaults.MinDelayMs)

    if (tooMany) { fail(r, CrawlDefaults.ReasonTooManyRedirects); return Nil }
    if (missing) { fail(r, "fetch_error"); return Nil }

    val page = cur.get
    val finalUrl = page.url // canonical final URL after redirects

    // X4 status dispatch (worker.go:308-342).
    page.status_code match {
      case 200 =>
        if (!ContentUrl.isHtmlContent(page.content_type)) {
          dead(r, CrawlDefaults.ReasonUnsupportedContentType); Nil
        } else if (ContentUrl.isBinaryUrl(r.url)) {
          dead(r, CrawlDefaults.ReasonBinaryUrl); Nil
        } else if (!page.extract_ok) {
          dead(r, CrawlDefaults.ReasonExtractFailed); Nil
        } else {
          val docId = UrlNormalizer.sha256Hex(r.url) // claimed URL keys the doc
          docs(docId) = (r.url, page.spans)
          val contentHash = UrlNormalizer.sha256Hex(
            page.spans.filter(_.kind == "text").map(_.text).mkString("\n"))
          // worker.go:399-401: FetchedParams carries ONLY ContentHash on
          // success — etag/last_modified stay NULL in the frontier.
          fetched(r, finalUrl, Some(contentHash), None)
          discoverLinks(r, page)
        }
      case 304 =>
        fetched(r, finalUrl, None, None); Nil
      case 404 =>
        dead(r, CrawlDefaults.ReasonNotFound); Nil
      case s if s == 429 || s >= 500 =>
        fail(r, s"http status $s"); Nil
      case s =>
        fail(r, s"unexpected http status $s"); Nil
    }
  }

  /** UpdateFetched[WithFinalURL] incl. re-key collision fallback
    * (frontier_repository.go:195-263, worker.go:419-437).
    */
  private def fetched(r: Row, finalUrl: String, contentHash: Option[String],
      etag: Option[String]): Unit = {
    val normFinal = UrlNormalizer.normalize(finalUrl)
    val normClaimed = UrlNormalizer.normalize(r.url)
    val wantRekey = (normFinal, normClaimed) match {
      case (Right(f), Right(c)) => f != c
      case _                    => false
    }
    if (wantRekey) {
      val Right(f) = normFinal: @unchecked
      val newHash = UrlNormalizer.sha256Hex(f)
      if (frontier.contains(newHash)) {
        // 23505 unique violation → plain UpdateFetched fallback
        markFetched(r, contentHash, etag)
      } else {
        frontier.remove(r.urlHash)
        r.url = f
        r.urlHash = newHash
        r.host = UrlNormalizer.extractHost(f).getOrElse(r.host)
        frontier.put(newHash, r)
        markFetched(r, contentHash, etag)
      }
    } else markFetched(r, contentHash, etag)
  }

  private def markFetched(r: Row, contentHash: Option[String],
      etag: Option[String]): Unit = {
    r.status = FrontierStatus.Fetched
    r.lastFetchedAt = Some(clock)
    r.fetchCount += 1
    r.contentHash = contentHash
    r.etag = etag
    r.retryCount = 0
  }

  /** UpdateFailed (frontier_repository.go:267-286): backoff uses the
    * pre-increment retry_count, dead keeps next_fetch_at.
    */
  private def fail(r: Row, err: String): Unit = {
    val oldRetry = r.retryCount
    r.retryCount += 1
    r.lastError = Some(err)
    if (r.retryCount >= maxRetries) r.status = FrontierStatus.Dead
    else {
      r.status = FrontierStatus.Pending
      r.nextFetchAt = clock + (1L << oldRetry) * 60000L
    }
  }

  private def dead(r: Row, reason: String): Unit = {
    r.status = FrontierStatus.Dead
    r.lastError = Some(reason)
  }

  /** F3 spider link discovery (crawler/link_handler.go:47-96,167-200).
    * parent_url is the FINAL page URL the links were found on — the
    * reference records e.Request.URL.String(), which colly rewrites to the
    * post-redirect URL (link_handler.go:187).
    */
  private def discoverLinks(r: Row, page: PageRow): Seq[Submission] = {
    if (r.depth + 1 > maxDepth) return Nil
    page.links.flatMap { href =>
      if (ContentUrl.shouldSkipLink(href)) None
      else {
        val abs = GoUrl.absoluteUrl(page.url, href)
        if (abs.isEmpty) None
        else if (preSubmitFilter.exists(f => f(abs))) None // B2 gate
        else (UrlNormalizer.normalize(abs), UrlNormalizer.urlHash(abs),
          UrlNormalizer.extractHost(abs)) match {
          case (Right(u), Right(h), Right(host)) =>
            val prio = Priorities.Default +
              (if (ContentUrl.isContentUrl(abs)) Priorities.SpiderArticleBonus else 0)
            Some(Submission(u, h, host, r.sourceId, FrontierOrigin.Spider,
              Some(page.url), r.depth + 1, prio, clock))
          case _ => None
        }
      }
    }
  }

  // ---- read side (R2: frontier_repository.go:444-468) ----
  def statusCounts: Map[String, Int] =
    frontier.values.groupBy(_.status).view.mapValues(_.size).toMap

  def seenSet: Set[String] = frontier.keySet.toSet
}
