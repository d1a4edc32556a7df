package graft.engine

import graft.core.GoUrl
import org.apache.spark.sql.{Dataset, SparkSession}

/** A source that has no feed_url yet (feed/discovery.go:20-24). */
final case class UndiscoveredSource(source_id: String, base_url: String)

/** One probe-able resource in the discovery world — the sandbox stand-in
  * for an HTTP fetch: page body plus the `<link rel="alternate">`
  * (type, href) pairs an HTML head would carry (the span model has no raw
  * HTML, so the link tags ride alongside, same as PageRow.links does for
  * anchors).
  */
final case class FeedProbePage(
    url: String,
    status_code: Int,
    body: String,
    alternate_links: Seq[(String, String)] // (type attribute, href)
)

/** F-surface: RSS/Atom feed auto-discovery for sources lacking a
  * feed_url (reference: crawler/internal/feed/discovery.go:49-252).
  *
  * Order of attempts per source, exactly the reference's:
  *   1. fetch the base URL; collect `<link rel="alternate">` candidates
  *      whose type contains rss+xml/atom+xml, resolved against the base
  *      (discovery.go:150-202);
  *   2. validate each candidate by fetching + parsing it — valid means it
  *      parses as a feed AND yields at least one item (discovery.go:219-232);
  *   3. fall back to probing the well-known paths /feed /rss /feed.xml
  *      /rss.xml /atom.xml /index.xml in order (discovery.go:50-57,204-217);
  *   4. per-source attempt throttling: a source attempted within
  *      `retryAfterMs` is skipped (discovery.go:234-252).
  *
  * The distributed form maps over the undiscovered-source table with the
  * probe world broadcast — per-source work is a handful of map lookups,
  * so a 10^7-source sweep is one narrow pass, no shuffle.
  */
object FeedDiscovery {

  /** discovery.go:50-57. */
  val commonFeedPaths: Seq[String] =
    Seq("/feed", "/rss", "/feed.xml", "/rss.xml", "/atom.xml", "/index.xml")

  /** discovery.go:60-64 + isFeedType. */
  def isFeedType(linkType: String): Boolean =
    linkType.contains("rss+xml") || linkType.contains("atom+xml")

  /** Feed candidates from the base page's alternate links, resolved
    * (discovery.go:174-202).
    */
  def extractFeedLinkCandidates(baseUrl: String, page: FeedProbePage): Seq[String] =
    page.alternate_links.collect {
      case (t, href) if isFeedType(t) && href.nonEmpty =>
        GoUrl.absoluteUrl(baseUrl, href)
    }.filter(_.nonEmpty)

  /** Valid feed = 200 + parses + at least one item (discovery.go:219-232). */
  def isValidFeed(fetch: String => Option[FeedProbePage])(url: String): Boolean =
    fetch(url).exists(p => p.status_code == 200 &&
      FeedIngest.parseFeedLinks(p.body).exists(_.nonEmpty))

  /** One source's discovery: HTML link tags first, then common paths;
    * "" when nothing validates (discovery.go:67-80).
    */
  def discoverFeed(baseUrl: String,
      fetch: String => Option[FeedProbePage]): String = {
    val fromHtml = fetch(baseUrl).filter(_.status_code == 200)
      .map(extractFeedLinkCandidates(baseUrl, _)).getOrElse(Nil)
      .find(isValidFeed(fetch))
    fromHtml.orElse {
      commonFeedPaths.iterator
        .map(p => GoUrl.absoluteUrl(baseUrl, p))
        .filter(_.nonEmpty)
        .find(isValidFeed(fetch))
    }.getOrElse("")
  }

  /** The discovery sweep (the loop body of RunDiscoveryLoop,
    * discovery.go:83-127): returns (source_id, feed_url ("" = none),
    * attempted_at) for every source actually attempted; sources attempted
    * within the retry window are skipped entirely.
    */
  def discoverFeeds(
      spark: SparkSession,
      sources: Dataset[UndiscoveredSource],
      probe: Map[String, FeedProbePage],
      lastAttempt: Map[String, Long],
      retryAfterMs: Long,
      now: Long
  ): Dataset[(String, String, Long)] = {
    import spark.implicits._
    val probeBc = spark.sparkContext.broadcast(probe)
    val attemptBc = spark.sparkContext.broadcast(lastAttempt)
    sources
      .filter(s => attemptBc.value.get(s.source_id)
        .forall(t => now - t >= retryAfterMs))
      .map(s => (s.source_id, discoverFeed(s.base_url, probeBc.value.get), now))
  }
}
