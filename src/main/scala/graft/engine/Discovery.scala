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
}
