package graft.core

/** Data model of the crawl engine. All timestamps are VIRTUAL milliseconds
  * (batch clock) — never wall clock — so every run is bit-reproducible
  * (SURVEY.md §7.4.1). Schemas mirror the reference DDL
  * (crawler/migrations/014_create_url_frontier.up.sql:2-26,
  * 015_create_host_state.up.sql:2-12, domain/frontier.go:37-98).
  */
object FrontierStatus {
  val Pending = "pending"
  val Fetching = "fetching"
  val Fetched = "fetched"
  val Failed = "failed"
  val Dead = "dead"
}

object FrontierOrigin {
  val Feed = "feed"
  val Sitemap = "sitemap"
  val Spider = "spider"
  val Manual = "manual"
  val Discovered = "discovered"
}

/** Priority constants (reference: domain/frontier.go:22-34). */
object Priorities {
  val Min = 1
  val Max = 10
  val Default = 5
  val FeedBonus = 2
  val SitemapBonus = 1
  val SpiderArticleBonus = 1
}

/** Reference config defaults (crawler/internal/config/fetcher/config.go:7-16,
  * crawler/migrations/015:6).
  */
object CrawlDefaults {
  val MaxRetries = 3
  val MaxRedirects = 5
  val MinDelayMs = 1000L
  val WorkerCount = 16
  val MaxBodyBytes: Int = 10 * 1024 * 1024
  val MaxRobotsBytes: Int = 512 * 1024
  /** Virtual epoch all runs start at (arbitrary fixed instant). */
  val VirtualEpochMs = 1700000000000L
  /** Reason strings (fetcher/worker.go:28-35). */
  val ReasonRobotsBlocked = "robots_blocked"
  val ReasonNotFound = "not_found"
  val ReasonTooManyRedirects = "too_many_redirects"
  val ReasonUnsupportedContentType = "unsupported_content_type"
  val ReasonBinaryUrl = "binary_url"
  val ReasonExtractFailed = "extract_failed"
}

/** One interleaved content span (graft input_hint shape). */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** A frontier row (reference: domain/frontier.go:37-70). `url_hash` is the
  * primary dedup key; `bucket` is the persisted hash-partition column
  * (pmod over host) so state joins are co-partitioned.
  */
final case class FrontierUrl(
    url: String,
    url_hash: String,
    host: String,
    source_id: String,
    origin: String,
    parent_url: Option[String],
    depth: Int,
    priority: Int,
    status: String,
    next_fetch_at: Long,
    last_fetched_at: Option[Long],
    fetch_count: Int,
    content_hash: Option[String],
    etag: Option[String],
    last_modified: Option[String],
    retry_count: Int,
    last_error: Option[String],
    discovered_at: Long,
    created_at: Long,
    updated_at: Long,
    bucket: Int
)

/** Per-host politeness state (reference: domain/frontier.go:73-82) plus
  * the per-host robots cache (host_state_repository.go:55-70: robots_txt
  * + fetched-at, re-fetched when the TTL lapses). Robots fields are None
  * until the host's robots are first served in keyed-robots mode.
  */
final case class HostState(
    host: String,
    last_fetch_at: Option[Long],
    min_delay_ms: Long,
    bucket: Int,
    robots_body: Option[String] = None,
    robots_status: Option[Int] = None,
    robots_fetched_at: Option[Long] = None
)

/** A submission into the frontier (reference: database/frontier_repository.go:44-53). */
final case class Submission(
    url: String, // normalized
    url_hash: String,
    host: String,
    source_id: String,
    origin: String,
    parent_url: Option[String],
    depth: Int,
    priority: Int,
    next_fetch_at: Long
)

/** One synthetic "web page" of the deterministic corpus — the engine's
  * stand-in for the network (FIXTURES.md §2). Keyed by the url_hash of its
  * canonical (normalized) URL.
  */
final case class PageRow(
    doc_id: String, // sha256 of canonical url (content/rawcontent/extractor.go:133-136)
    url: String, // canonical (normalized) URL
    url_hash: String,
    host: String,
    status_code: Int,
    redirect_to: String, // "" = none; target canonical URL
    content_type: String,
    etag: String, // "" = none
    extract_ok: Boolean,
    spans: Seq[Span],
    links: Seq[String] // raw hrefs as they would appear in the HTML
)

/** robots.txt fixture row (FIXTURES.md §2). */
final case class RobotsRow(host: String, body: String, status_code: Int)

/** A seed-list entry (discovery/pipeline.go:369-379: depth 0, priority 5). */
final case class Seed(url: String, source_id: String)

/** Source-registry entry (the reference resolves discovered-link
  * source_name from the source config, link_handler.go:396
  * `cc.Source.Name`). Small keyed table persisted in the snapshot
  * manifest; unregistered ids fall back to the id itself.
  */
final case class SourceEntry(source_id: String, name: String)

/** Curated per-domain review state (discovered_domain_states,
  * database/domain_state_repository.go: statuses active | ignored |
  * reviewing | promoted, upsert keeps created_at, status-specific
  * timestamps set on transition). Virtual-clock timestamps.
  */
final case class DomainStateRow(
    domain: String,
    status: String,
    notes: Option[String],
    created_at: Long,
    updated_at: Long,
    ignored_at: Option[Long],
    promoted_at: Option[Long]
)

/** One claim-log entry — the crawl-ordering trace compared against the
  * oracle (FIXTURES.md §3). The in-batch order is DEFINED by
  * (priority DESC, next_fetch_at ASC, url_hash ASC) — the claim SQL's
  * ORDER BY plus the deterministic tie-break — so no sequence number is
  * materialized; readers sort by that key.
  */
final case class ClaimLogEntry(
    batch_id: Long,
    url_hash: String,
    url: String,
    host: String,
    priority: Int,
    next_fetch_at: Long
)

/** One discovered-link tracking row (reference:
  * domain/discovered_link.go:9-25, collector saveLinkToQueue
  * link_handler.go:384-406). Persisted per batch; the queryable table is
  * the (source_id, url_hash)-latest view with upsert semantics
  * (discovered_link_repository.go:46-59: parent/depth/priority take the
  * LAST write, discovered_at keeps the first). http_status/content_type
  * are nullable and stay unset on the spider path — exactly the
  * reference's saveLinkToQueue, whose aggregate ratios are NULL-aware.
  */
final case class DiscoveredLinkRow(
    source_id: String,
    source_name: String,
    url: String, // normalized (the engine's canonical key)
    url_hash: String,
    parent_url: Option[String],
    depth: Int,
    domain: String,
    http_status: Option[Int],
    content_type: Option[String],
    discovered_at: Long,
    queued_at: Long,
    status: String,
    priority: Int,
    batch_id: Long
)

/** Per-partition lineage metrics per micro-batch (north-rule requirement). */
final case class LineageRow(
    batch_id: Long,
    partition_id: Int,
    urls_discovered: Long,
    urls_fetched: Long,
    urls_deduped: Long
)

/** Outcome of fetching one claimed URL (engine-internal). */
final case class FetchOutcome(
    url_hash: String,
    outcome: String, // fetched | dead | failed
    reason: String, // last_error / dead reason, "" if none
    final_url: String, // "" if unchanged
    content_hash: String, // "" if none
    etag: String,
    discovered: Seq[Submission]
)
