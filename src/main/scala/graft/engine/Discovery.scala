package graft.engine

import graft.core._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** F6: the discovery pipeline — candidate URLs flow through normalize →
  * blocklist/allowlist substring filters → seen-set dedup → daily budget
  * gate → frontier submissions at origin "discovered", depth 0, priority 5
  * (reference: crawler/internal/discovery/pipeline.go:123-379,
  * database/frontier_repository.go:83-91).
  */
object Discovery {

  final case class Candidate(url: String, source_id: String)

  /** Case-insensitive substring block/allow semantics
    * (discovery/pipeline.go:343-367). Empty allowlist = everything allowed.
    */
  def isBlocked(canonicalUrl: String, blocklist: Seq[String]): Boolean = {
    val lower = canonicalUrl.toLowerCase
    blocklist.exists(b => b.trim.nonEmpty && lower.contains(b.trim.toLowerCase))
  }

  def isAllowlisted(canonicalUrl: String, allowlist: Seq[String]): Boolean = {
    if (allowlist.forall(_.trim.isEmpty)) return true
    val lower = canonicalUrl.toLowerCase
    allowlist.exists(a => a.trim.nonEmpty && lower.contains(a.trim.toLowerCase))
  }

  /** The distributed pipeline: normalize + filter + dedup against the
    * frontier seen-set (left_anti — the authoritative exact check) +
    * count-based budget gate (CountByOriginSince analog). Returns the
    * submissions that fit the remaining budget, in deterministic
    * (url_hash) order.
    */
  def discover(
      spark: SparkSession,
      candidates: Dataset[Candidate],
      frontier: Dataset[FrontierUrl],
      blocklist: Seq[String],
      allowlist: Seq[String],
      dailyBudget: Long,
      usedToday: Long,
      now: Long
  ): Dataset[Submission] = {
    import spark.implicits._
    val bl = blocklist
    val al = allowlist
    val normalized = candidates.flatMap { c =>
      (UrlNormalizer.normalize(c.url), UrlNormalizer.urlHash(c.url),
        UrlNormalizer.extractHost(c.url)) match {
        case (Right(u), Right(h), Right(host))
            if !isBlocked(u, bl) && isAllowlisted(u, al) =>
          Some(Submission(u, h, host, c.source_id, FrontierOrigin.Discovered,
            None, 0, Priorities.Default, now))
        case _ => None
      }
    }.dropDuplicates("url_hash")

    val fresh = normalized
      .join(frontier.select("url_hash"), Seq("url_hash"), "left_anti")
      .select("url", "url_hash", "host", "source_id", "origin", "parent_url",
        "depth", "priority", "next_fetch_at")
      .as[Submission]

    val remaining = math.max(dailyBudget - usedToday, 0L)
    // deterministic budget cut: lowest url_hash first (stable across runs)
    fresh.orderBy("url_hash").limit(
      math.min(remaining, Int.MaxValue.toLong).toInt)
  }

  /** R6 analog: URLs discovered since a cutoff, for the budget gate
    * (frontier_repository.go:83-91).
    */
  def countByOriginSince(frontier: Dataset[FrontierUrl], origin: String,
      sinceMs: Long): Long =
    // column predicates (not a typed lambda) so both reach the parquet scan
    // as PushedFilters and the scan prunes to two columns
    frontier.filter(col("origin") === origin && col("discovered_at") >= sinceMs)
      .count()

  // ------------------------------------------------------- F6 back half
  // identity resolution → enrichment → risk score → candidate persistence
  // (discovery/resolver.go:62-186, enrichment.go:50-288,
  // pipeline.go:150-341)

  /** A persisted source candidate (discovery/candidate.go, the row
    * pipeline.enrichAndCreateCandidate creates at pipeline.go:311-341).
    */
  final case class SourceCandidateRow(
      canonical_url: String,
      identity_key: String,
      referring_source_id: String,
      kind: String, // platform_sub | new (resolver.go:94-119)
      title: String,
      favicon_url: String,
      category: String,
      template_hint: String,
      enrichment_reason: String,
      robots_txt_fetched: Boolean,
      robots_txt_allowed: Option[Boolean],
      risk_score: Double,
      risk_reasons: Seq[String],
      status: String, // pending | approved | processing
      created_at: Long
  )

  /** A created source (pipeline.ProcessApprovedCandidates → CreateSource). */
  final case class CreatedSource(source_id: String, identity_key: String,
      canonical_url: String, category: String, template_hint: String)

  /** Identity key from a canonical URL (resolver.go:122-147): default =
    * lowercase host; known multi-tenant platforms use "platform:tenant".
    */
  def identityKey(canonicalUrl: String): Either[String, (String, String)] =
    GoUrl.parse(canonicalUrl) match {
      case Left(e) => Left(e)
      case Right(u) =>
        val host = u.hostname.toLowerCase
        if (host.isEmpty) Left("empty host")
        else extractPlatformIdentity(host, u.path) match {
          case Some((platform, tenant)) =>
            Right((s"$platform:$tenant", s"platform $platform tenant from path"))
          case None => Right((host, "identity_key=host (default)"))
        }
    }

  /** (platform, tenant) for known platforms; exact-host match only —
    * subdomain Substack blogs intentionally fall through
    * (resolver.go:149-173).
    */
  def extractPlatformIdentity(host: String, rawPath: String): Option[(String, String)] = {
    val segments = rawPath.split("/").filter(_.nonEmpty)
    host match {
      case "substack.com" => Some(("substack", segments.headOption.getOrElse("")))
      case "medium.com" =>
        Some(("medium", segments.headOption.filter(_.startsWith("@"))
          .map(_.stripPrefix("@")).getOrElse("")))
      case _ => None
    }
  }

  /** Deterministic rule-based category (enrichment.go:226-241). */
  def inferCategory(rawUrl: String, title: String): String = {
    val lowerUrl = rawUrl.toLowerCase
    val lowerTitle = title.toLowerCase
    def word(w: String) = s"\\b$w\\b".r.findFirstIn(lowerTitle).isDefined
    if (lowerUrl.contains("/news") || word("news")) "news"
    else if (lowerUrl.contains("/blog") || word("blog")) "blog"
    else if (lowerUrl.contains("/shop") || lowerUrl.contains("/store") ||
      word("shop") || word("store") || word("commerce")) "commerce"
    else "blog"
  }

  /** Template hint from the hostname (enrichment.go:243-258). */
  def inferTemplateHint(host: String): String = {
    val h = host.toLowerCase
    if (h.contains("substack")) "substack"
    else if (h.contains("medium.com")) "medium"
    else if (h.contains("wordpress")) "wordpress"
    else ""
  }

  private val riskSpamPattern = "(casino|viagra|lottery|click-here)".r

  /** Risk scoring (enrichment.go:261-288): url spam 0.5, adult content
    * 0.4, minimal metadata 0.1, capped at 1.0.
    */
  def riskScore(canonicalUrl: String, title: String, faviconUrl: String,
      adultContent: Boolean): (Double, Seq[String]) = {
    var score = 0.0
    val reasons = scala.collection.mutable.ArrayBuffer.empty[String]
    if (riskSpamPattern.findFirstIn(canonicalUrl.toLowerCase).isDefined) {
      score += 0.5; reasons += "url_spam_indicator"
    }
    if (adultContent) { score += 0.4; reasons += "adult_content" }
    if (title.isEmpty && faviconUrl.isEmpty) {
      score += 0.1; reasons += "minimal_metadata"
    }
    (math.min(score, 1.0), reasons.toSeq)
  }

  /** Conservative robots pre-check (enrichment.go:201-223): blocked only
    * when a literal "disallow: /" line appears in the first 2 KB of a 200
    * body, regardless of group.
    */
  def robotsPrecheckAllowed(body: String, statusCode: Int): Boolean =
    statusCode != 200 ||
      !body.take(2048).toLowerCase.linesIterator.exists(_.trim == "disallow: /")

  /** The resolve → dedup → enrich → risk → persist stage over already
    * normalized+filtered candidate URLs (the front half's output):
    *
    *   - identity_key joins against `existingSources(identity_key,
    *     source_id)`: hits become frontier submissions for that source
    *     (pipeline.handleExistingSource), misses become candidates;
    *   - an anti-join against `pendingCandidates(identity_key)` plus a
    *     per-key argmin dedups within and across runs (the reference's
    *     GetPendingByIdentityKey check, sequentialized by URL order);
    *   - enrichment metadata (title/favicon) comes from `pageMeta(url,
    *     title, favicon_url)` — the sandbox stand-in for the lightweight
    *     fetch, joined, not fetched;
    *   - a positive maxCandidates keeps the first N in canonical-URL
    *     order (the reference caps per run in input order; a distributed
    *     run needs a defined order).
    *
    * Scale shape: two equi-joins on identity_key / url (the small sides
    * broadcast when small), per-row rule evaluation, no collects.
    */
  def resolveEnrichCandidates(
      spark: SparkSession,
      normalized: Dataset[Submission],
      existingSources: Dataset[(String, String)], // (identity_key, source_id)
      pendingCandidates: Dataset[String], // identity keys already pending
      pageMeta: Dataset[(String, String, String)], // (url, title, favicon)
      robotsBlockAllHosts: Set[String], // hosts whose robots pre-check fails
      maxCandidates: Int,
      now: Long
  ): (Dataset[Submission], Dataset[SourceCandidateRow]) = {
    import spark.implicits._
    val keyed = normalized.flatMap { s =>
      identityKey(s.url).toOption.map { case (k, _) => (k, s) }
    }.toDF("identity_key", "s").as[(String, Submission)]

    val sourcesKeyed = existingSources
      .toDF("identity_key", "source_id").as[(String, String)]
    val joined = keyed.joinWith(sourcesKeyed,
      keyed("identity_key") === sourcesKeyed("identity_key"), "left_outer")

    // hits: submit to the frontier under the EXISTING source id
    val existingSubmits = joined.flatMap {
      case ((_, s), hit) => Option(hit).map { case (_, sourceId) =>
        s.copy(source_id = sourceId)
      }
    }

    val blockAll = robotsBlockAllHosts
    val misses = joined.flatMap {
      case ((k, s), hit) => if (hit == null) Some((k, s)) else None
    }
    // dedup: one candidate per identity key (lowest canonical URL), and
    // none that already has a pending candidate
    val uniq = misses.toDF("identity_key", "s")
      .groupBy($"identity_key").agg(min_by($"s", $"s.url").as("s"))
      .join(pendingCandidates.toDF("identity_key"), Seq("identity_key"), "left_anti")
      .as[(String, Submission)]
    val meta = pageMeta.toDF("url", "title", "favicon_url")
    val enriched = uniq.toDF("identity_key", "s")
      .join(meta, col("s.url") === meta("url"), "left_outer")
      .select($"identity_key", $"s", $"title", $"favicon_url")
      .as[(String, Submission, String, String)]
      .map { case (k, s, titleOrNull, favOrNull) =>
        val title = Option(titleOrNull).getOrElse("")
        val favicon = Option(favOrNull).getOrElse("")
        val host = GoUrl.parse(s.url).map(_.hostname.toLowerCase).getOrElse("")
        val kind =
          if (extractPlatformIdentity(host,
            GoUrl.parse(s.url).map(_.path).getOrElse("")).isDefined) "platform_sub"
          else "new"
        val fetched = title.nonEmpty || favicon.nonEmpty
        val reason = if (fetched) "parsed title/favicon from head" else "lightweight fetch"
        val robotsAllowed = !blockAll.contains(host)
        val (score, reasons) = riskScore(s.url, title, favicon, adultContent = false)
        SourceCandidateRow(s.url, k, s.source_id, kind, title, favicon,
          inferCategory(s.url, title), inferTemplateHint(host), reason,
          robots_txt_fetched = true, Some(robotsAllowed), score, reasons,
          "pending", now)
      }
      // robots pre-check: disallowed hosts never become candidates
      // (pipeline.go:322-326)
      .filter(c => c.robots_txt_allowed.getOrElse(true))
    val capped =
      if (maxCandidates <= 0) enriched
      else enriched.orderBy("canonical_url").limit(maxCandidates)
    (existingSubmits, capped)
  }

  /** ProcessApprovedCandidates (pipeline.go:254-295): approved candidates
    * become sources (deterministic id from the identity key) and seed the
    * frontier; their status moves to processing.
    */
  def processApprovedCandidates(
      spark: SparkSession,
      candidates: Dataset[SourceCandidateRow],
      now: Long
  ): (Dataset[CreatedSource], Dataset[Submission], Dataset[SourceCandidateRow]) = {
    import spark.implicits._
    val approved = candidates.filter(_.status == "approved")
    val sources = approved.map { c =>
      CreatedSource("src-" + UrlNormalizer.sha256Hex(c.identity_key).take(12),
        c.identity_key, c.canonical_url, c.category, c.template_hint)
    }
    val seeds = approved.map { c =>
      val sid = "src-" + UrlNormalizer.sha256Hex(c.identity_key).take(12)
      val host = GoUrl.parse(c.canonical_url).map(_.hostname.toLowerCase).getOrElse("")
      Submission(c.canonical_url, UrlNormalizer.sha256Hex(c.canonical_url),
        host, sid, FrontierOrigin.Discovered, None, 0, Priorities.Default, now)
    }
    val updated = candidates.map(c =>
      if (c.status == "approved") c.copy(status = "processing") else c)
    (sources, seeds, updated)
  }
}
