package graft.engine

import graft.core._
import graft.state.SnapshotStore
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.util.hashing.MurmurHash3

final case class EngineConfig(
    numBuckets: Int = 32,
    maxRetries: Int = CrawlDefaults.MaxRetries,
    maxRedirects: Int = CrawlDefaults.MaxRedirects,
    maxDepth: Int = 3,
    userAgent: String = "graft-bot",
    maxBatches: Int = 100000
)

/** Engine-internal rows (kept flat for stable encoders). */
private[engine] final case class FetchState(
    seq: Long,
    claim: FrontierUrl,
    hops: Int,
    lookupHash: String,
    failReason: String, // "" = still fetching / ok
    page: Option[PageRow]
)

private[engine] final case class Resolved(
    seq: Long,
    claim: FrontierUrl,
    outcome: String, // fetched | dead | failed
    reason: String,
    finalUrl: String, // "" = none/unchanged
    contentHash: String, // "" = none
    docId: String, // "" = no doc indexed
    spans: Seq[Span],
    links: Seq[String],
    pageUrl: String // final page canonical URL (base for link resolution)
)

private[engine] final case class SubFirst(
    url_hash: String,
    priority: Int,
    next_fetch_at: Long,
    url: String,
    host: String,
    source_id: String,
    origin: String,
    parent_url: Option[String],
    depth: Int,
    bucket: Int
)

private[engine] final case class RekeyCandidate(
    seq: Long, oldHash: String, newUrl: String, newHash: String,
    newHost: String, existsInTable: Boolean)

/** The Spark-native micro-batch frontier drain (SURVEY.md §2.3/§2.4, §7).
  *
  * Each micro-batch is the deterministic linearization defined by the
  * oracle (graft.oracle.CrawlOracle): politeness-filtered per-host top-1
  * claim (Window over (priority DESC, next_fetch_at ASC, url_hash ASC) —
  * the batch form of the reference's `ORDER BY priority DESC, next_fetch_at
  * ASC LIMIT 1 FOR UPDATE SKIP LOCKED` claim,
  * database/frontier_repository.go:151-161), distributed fetch against the
  * corpus table (the sandbox stand-in for HTTP I/O), outcome dispatch
  * (fetcher/worker.go:308-437), and a set-oriented submit-merge with the
  * reference's upsert semantics (frontier_repository.go:58-79) that
  * pre-aggregates in-batch duplicates to match sequential upserts.
  *
  * Scale design: the frontier is hash-partitioned by host into
  * `numBuckets` buckets persisted as separate parquet paths; a batch
  * rewrites ONLY the buckets its delta touches (claims, re-keys, inserts),
  * carrying all other bucket files forward in the snapshot manifest —
  * the Iceberg copy-on-write MERGE shape. State joins (frontier ⋈
  * host_state, frontier ⋈ submissions) are co-bucketed by the same
  * function, and the per-batch working set is the eligible slice, never
  * the full frontier.
  */
final class CrawlEngine(
    spark: SparkSession,
    store: SnapshotStore,
    pages: Dataset[PageRow],
    robotsRows: Seq[RobotsRow],
    cfg: EngineConfig = EngineConfig()
) extends Serializable {

  import spark.implicits._

  /** One bucket function everywhere (driver, executors, merge logic). */
  def bucketOf(host: String): Int =
    (MurmurHash3.stringHash(host) & 0x7fffffff) % cfg.numBuckets

  private val robotsMap: Map[String, RobotsRules] = robotsRows.map { r =>
    r.host -> RobotsRules.fromResponse(r.body, r.status_code, cfg.userAgent)
  }.toMap
  private val robotsBc = spark.sparkContext.broadcast(robotsMap)

  private val pagesCached = pages.cache()

  /** Redirect topology (url_hash → redirect_to) broadcast once per drain:
    * redirect rows are sparse corpus metadata, so the whole fetch stage —
    * chain following included — is ONE distributed pass + one join instead
    * of a join per hop. (A live-HTTP fetcher has the same single-pass shape:
    * the redirect loop happens per row inside the fetch task.)
    */
  private lazy val redirectBc = spark.sparkContext.broadcast(
    pagesCached
      .filter(p => p.status_code >= 300 && p.status_code < 400 && p.redirect_to.nonEmpty)
      .map(p => p.url_hash -> p.redirect_to)
      .collect().toMap)

  var clock: Long = CrawlDefaults.VirtualEpochMs
  var batchId: Long = 0L
  private var bucketPaths: Map[Int, String] = Map.empty
  private var hostStatePath: String = ""

  // ----------------------------------------------------------------- state IO

  /** Current frontier snapshot: union of per-bucket parquet paths from the
    * manifest (the bucket value is carried by the path, not the files).
    */
  def frontier(): Dataset[FrontierUrl] = {
    val parts = bucketPaths.toSeq.sortBy(_._1).map { case (b, p) => readBucket(b, p) }
    if (parts.isEmpty) spark.emptyDataset[FrontierUrl]
    else parts.reduce(_ union _)
  }

  private lazy val frontierSchema =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[FrontierUrl]().schema

  def hostState(): Dataset[HostState] =
    if (hostStatePath.isEmpty) spark.emptyDataset[HostState]
    else spark.read.parquet(hostStatePath).as[HostState]

  def claimLog(): DataFrame = readAppendTable("claim_log")
  def lineage(): DataFrame = readAppendTable("lineage")
  def docs(): DataFrame = readAppendTable("docs")

  private def readAppendTable(name: String): DataFrame = {
    val dirs = (1L to batchId).map(b => store.dataPath(s"${name}_v$b"))
      .filter(p => new java.io.File(p).exists())
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs: _*)
  }

  private def writeBuckets(df: Dataset[FrontierUrl], deltaBuckets: Set[Int],
      version: Long): Unit = {
    if (deltaBuckets.isEmpty) return
    val touched = df.filter($"bucket".isin(deltaBuckets.toSeq: _*))
    val path = store.dataPath(s"frontier_v$version")
    touched.repartition(math.max(1, deltaBuckets.size), $"bucket")
      .sortWithinPartitions(desc("priority"), asc("next_fetch_at"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    // manifest: delta buckets point at the new files, others carry forward
    bucketPaths = bucketPaths ++ deltaBuckets.map(b => b -> s"$path/bucket=$b")
  }

  /** Reads one partitioned bucket dir back with its bucket column. */
  private def readBucket(b: Int, path: String): Dataset[FrontierUrl] =
    spark.read.schema(frontierNoBucketSchema).parquet(path)
      .withColumn("bucket", lit(b)).as[FrontierUrl]

  private lazy val frontierNoBucketSchema = org.apache.spark.sql.types.StructType(
    frontierSchema.filterNot(_.name == "bucket"))

  // ----------------------------------------------------------------- seeding

  /** Seed the frontier (discovery/pipeline.go:369-379: priority 5, depth 0)
    * and commit snapshot 0.
    */
  def seed(seeds: Seq[Seed]): Unit = {
    val subs = seeds.zipWithIndex.flatMap { case (sd, i) =>
      (UrlNormalizer.normalize(sd.url), UrlNormalizer.urlHash(sd.url),
        UrlNormalizer.extractHost(sd.url)) match {
        case (Right(u), Right(h), Right(host)) =>
          Some((0L, i, Submission(u, h, host, sd.source_id,
            FrontierOrigin.Manual, None, 0, Priorities.Default, clock)))
        case _ => None
      }
    }
    val subsDs = spark.createDataset(subs)
    val merged = mergeSubmissions(spark.emptyDataset[FrontierUrl], subsDs)._1
    val delta = merged.select("bucket").distinct().as[Int].collect().toSet
    writeBuckets(merged, delta, 0L)
    writeHostState(hostState(), Set.empty, 0L)
    commit()
  }

  private def writeHostState(hs: Dataset[HostState], touchedHosts: Set[String],
      version: Long): Unit = {
    val path = store.dataPath(s"host_state_v$version")
    hs.coalesce(1).write.mode("overwrite").parquet(path)
    hostStatePath = path
  }

  private def commit(): Unit =
    store.commit(store.Manifest(batchId, clock, bucketPaths,
      Map("host_state" -> hostStatePath)))

  /** Resume from the latest committed snapshot. */
  def resume(): Boolean =
    store.latest() match {
      case Some(m) =>
        batchId = m.batchId
        clock = m.clock
        bucketPaths = m.buckets
        hostStatePath = m.tables.getOrElse("host_state", "")
        true
      case None => false
    }

  // ----------------------------------------------------------------- batches

  /** Runs micro-batches until the frontier drains; returns #batches run. */
  def runDrain(): Long = {
    var n = 0L
    while (n < cfg.maxBatches && step()) n += 1
    n
  }

  /** One micro-batch. Returns false when no pending URLs remain. */
  def step(): Boolean = {
    val f0 = frontier().cache()
    try stepOn(f0)
    finally f0.unpersist()
  }

  private def stepOn(f0: Dataset[FrontierUrl]): Boolean = {
    val hs = hostState()
    val pending = f0.filter($"status" === FrontierStatus.Pending)

    // readiness: max(next_fetch_at, host_ready) per row; min over rows is
    // the next virtual instant anything is claimable (S1 politeness
    // predicate, frontier_repository.go:155-157).
    val withReady = pending.join(hs.select($"host", $"last_fetch_at", $"min_delay_ms"),
        Seq("host"), "left")
      .withColumn("host_ready",
        coalesce($"last_fetch_at" + $"min_delay_ms", lit(Long.MinValue)))
      .withColumn("ready_at", greatest($"next_fetch_at", $"host_ready"))
    val minReady = withReady.agg(min($"ready_at")).as[Option[Long]].first()
    minReady match {
      case None => false // drained
      case Some(t) =>
        clock = math.max(clock, t)
        batchId += 1
        runBatch(f0, withReady)
        true
    }
  }

  private def runBatch(f0: Dataset[FrontierUrl], withReady: DataFrame): Unit = {
    val now = clock
    val bid = batchId
    val nb = cfg.numBuckets
    val maxRedirects = cfg.maxRedirects
    val maxRetries = cfg.maxRetries
    val maxDepth = cfg.maxDepth
    val robots = robotsBc

    // ---- S1 claim: top-1 per host over the eligible slice ----
    val eligible = withReady
      .filter($"next_fetch_at" <= now && $"host_ready" <= now)
      .drop("host_ready", "ready_at", "last_fetch_at", "min_delay_ms")
    val w = Window.partitionBy($"host")
      .orderBy(desc("priority"), asc("next_fetch_at"), asc("url_hash"))
    val top1 = eligible.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
      .as[FrontierUrl]
    // global claim order with sequence numbers (claim log): distributed
    // zipWithIndex over the total order — no single-partition window.
    val claims: Dataset[(Long, FrontierUrl)] = spark.createDataset(
      top1.orderBy(desc("priority"), asc("next_fetch_at"), asc("url_hash"))
        .rdd.zipWithIndex.map { case (r, i) => (i, r) })
      .cache()

    // claim log (the crawl-ordering trace)
    claims.map { case (seq, r) =>
      ClaimLogEntry(bid, seq.toInt, r.url_hash, r.url, r.host, r.priority)
    }.toDF().coalesce(1).write.mode("overwrite")
      .parquet(store.dataPath(s"claim_log_v$bid"))

    // ---- X2 robots gate (before fetch; blocked rows never touch the host)
    //      + X3 redirect-chain resolution (fetcher/redirect.go:16-23) in one
    //      distributed pass using the broadcast redirect topology ----
    val redirects = redirectBc
    val gated: Dataset[FetchState] = claims.map { case (seq, r) =>
      val path = GoUrl.parse(r.url).map(_.path).getOrElse("/")
      val allowed = robots.value.getOrElse(r.host, RobotsRules.AllowAll).isAllowed(path)
      if (!allowed) FetchState(seq, r, 0, "", CrawlDefaults.ReasonRobotsBlocked, None)
      else {
        var hash = r.url_hash
        var hops = 0
        var fail = ""
        while (fail.isEmpty && redirects.value.contains(hash)) {
          hops += 1
          if (hops > maxRedirects) fail = CrawlDefaults.ReasonTooManyRedirects
          else hash = UrlNormalizer.sha256Hex(redirects.value(hash))
        }
        FetchState(seq, r, hops, hash, fail, None)
      }
    }

    // single lookup join against the corpus (the fetch I/O stage)
    val toFetch = gated.filter(_.failReason.isEmpty)
    val fetchStates = gated.filter(_.failReason.nonEmpty).union(
      toFetch.joinWith(pagesCached,
          toFetch("lookupHash") === pagesCached("url_hash"), "left_outer")
        .map { case (s, pageOrNull) =>
          Option(pageOrNull) match {
            case None    => s.copy(failReason = "fetch_error")
            case Some(p) => s.copy(page = Some(p))
          }
        })

    // ---- X4-X6 outcome dispatch ----
    val resolved: Dataset[Resolved] = fetchStates.map { s =>
      val r = s.claim
      if (s.failReason == CrawlDefaults.ReasonRobotsBlocked)
        Resolved(s.seq, r, "dead", s.failReason, "", "", "", Nil, Nil, "")
      else if (s.failReason.nonEmpty) // fetch_error / too_many_redirects
        Resolved(s.seq, r, "failed", s.failReason, "", "", "", Nil, Nil, "")
      else {
        val p = s.page.get
        p.status_code match {
          case 200 =>
            if (!ContentUrl.isHtmlContent(p.content_type))
              Resolved(s.seq, r, "dead", CrawlDefaults.ReasonUnsupportedContentType,
                "", "", "", Nil, Nil, p.url)
            else if (ContentUrl.isBinaryUrl(r.url))
              Resolved(s.seq, r, "dead", CrawlDefaults.ReasonBinaryUrl,
                "", "", "", Nil, Nil, p.url)
            else if (!p.extract_ok)
              Resolved(s.seq, r, "dead", CrawlDefaults.ReasonExtractFailed,
                "", "", "", Nil, Nil, p.url)
            else {
              val contentHash = UrlNormalizer.sha256Hex(
                p.spans.filter(_.kind == "text").map(_.text).mkString("\n"))
              Resolved(s.seq, r, "fetched", "", p.url, contentHash,
                UrlNormalizer.sha256Hex(r.url), p.spans, p.links, p.url)
            }
          case 304 =>
            Resolved(s.seq, r, "fetched", "", p.url, "", "", Nil, Nil, p.url)
          case 404 =>
            Resolved(s.seq, r, "dead", CrawlDefaults.ReasonNotFound,
              "", "", "", Nil, Nil, p.url)
          case c if c == 429 || c >= 500 =>
            Resolved(s.seq, r, "failed", s"http status $c", "", "", "", Nil, Nil, p.url)
          case c =>
            Resolved(s.seq, r, "failed", s"unexpected http status $c",
              "", "", "", Nil, Nil, p.url)
        }
      }
    }.cache()

    // ---- X7 final-URL re-key with collision fallback (23505 semantics) ----
    val rekeyCandidates = resolved.flatMap { o =>
      if (o.outcome != "fetched" || o.finalUrl.isEmpty) None
      else (UrlNormalizer.normalize(o.finalUrl), UrlNormalizer.normalize(o.claim.url)) match {
        case (Right(f), Right(c)) if f != c =>
          val nh = UrlNormalizer.sha256Hex(f)
          val host = UrlNormalizer.extractHost(f).getOrElse(o.claim.host)
          Some(RekeyCandidate(o.seq, o.claim.url_hash, f, nh, host, existsInTable = false))
        case _ => None
      }
    }
    val candWithExists = rekeyCandidates
      .joinWith(f0, rekeyCandidates("newHash") === f0("url_hash"), "left_outer")
      .map { case (c, fOrNull) => c.copy(existsInTable = fOrNull != null) }
      .collect().sortBy(_.seq)
    // sequential resolution in claim order — matches the reference's
    // per-transaction unique check (frontier_repository.go:243-253)
    val removedOld = scala.collection.mutable.Set[String]()
    val addedNew = scala.collection.mutable.Set[String]()
    val rekeyOk = scala.collection.mutable.Map[String, RekeyCandidate]()
    candWithExists.foreach { c =>
      val exists = (c.existsInTable && !removedOld.contains(c.newHash)) ||
        addedNew.contains(c.newHash)
      if (!exists) {
        rekeyOk(c.oldHash) = c
        removedOld += c.oldHash
        addedNew += c.newHash
      }
    }
    val rekeyBc = spark.sparkContext.broadcast(rekeyOk.toMap)

    // ---- build updated frontier rows for all claims ----
    val updates: Dataset[FrontierUrl] = resolved.map { o =>
      val r = o.claim
      val base = o.outcome match {
        case "fetched" =>
          r.copy(status = FrontierStatus.Fetched, last_fetched_at = Some(now),
            fetch_count = r.fetch_count + 1,
            content_hash = if (o.contentHash.isEmpty) None else Some(o.contentHash),
            etag = None, last_modified = None,
            retry_count = 0, updated_at = now)
        case "dead" =>
          r.copy(status = FrontierStatus.Dead, last_error = Some(o.reason),
            updated_at = now)
        case _ => // failed: backoff uses pre-increment retry_count
          val oldRetry = r.retry_count
          if (oldRetry + 1 >= maxRetries)
            r.copy(status = FrontierStatus.Dead, retry_count = oldRetry + 1,
              last_error = Some(o.reason), updated_at = now)
          else
            r.copy(status = FrontierStatus.Pending, retry_count = oldRetry + 1,
              last_error = Some(o.reason),
              next_fetch_at = now + (1L << oldRetry) * 60000L, updated_at = now)
      }
      rekeyBc.value.get(r.url_hash) match {
        case Some(c) if o.outcome == "fetched" =>
          base.copy(url = c.newUrl, url_hash = c.newHash, host = c.newHost,
            bucket = (MurmurHash3.stringHash(c.newHost) & 0x7fffffff) % nb)
        case _ => base
      }
    }.cache()

    // ---- docs sink (ES-index analog; op: one doc per fetched 200 page) ----
    resolved.filter(o => o.docId.nonEmpty)
      .map(o => (o.docId, o.claim.url, o.spans, bid))
      .toDF("doc_id", "url", "spans", "batch_id")
      .coalesce(1).write.mode("overwrite").parquet(store.dataPath(s"docs_v$bid"))

    // ---- F3 link discovery → submissions ----
    val submissions: Dataset[(Long, Int, Submission)] = resolved.flatMap { o =>
      if (o.outcome != "fetched" || o.links.isEmpty || o.claim.depth + 1 > maxDepth) Nil
      else o.links.zipWithIndex.flatMap { case (href, li) =>
        if (ContentUrl.shouldSkipLink(href)) None
        else {
          val abs = GoUrl.absoluteUrl(o.pageUrl, href)
          if (abs.isEmpty) None
          else (UrlNormalizer.normalize(abs), UrlNormalizer.urlHash(abs),
            UrlNormalizer.extractHost(abs)) match {
            case (Right(u), Right(h), Right(host)) =>
              val prio = Priorities.Default +
                (if (ContentUrl.isContentUrl(abs)) Priorities.SpiderArticleBonus else 0)
              // parent_url = the FINAL page the link was found on
              // (colly rewrites e.Request.URL after redirects)
              Some((o.seq, li, Submission(u, h, host, o.claim.source_id,
                FrontierOrigin.Spider, Some(o.pageUrl), o.claim.depth + 1,
                prio, now)))
            case _ => None
          }
        }
      }
    }

    // ---- apply outcomes then submissions (the batch linearization) ----
    val claimedKeys = claims.map(_._2.url_hash).toDF("url_hash")
    // NB: a using-column join moves the key column first; re-select the
    // canonical field order before the positional union with `updates`.
    val f1 = f0.join(claimedKeys, Seq("url_hash"), "left_anti")
      .select(frontierSchema.fieldNames.map(col): _*)
      .as[FrontierUrl].union(updates)
    val (f2, mergeStats) = mergeSubmissions(f1, submissions)

    // ---- lineage per bucket (north rule: per-partition metrics) ----
    val fetchedPerBucket = updates.filter(_.status == FrontierStatus.Fetched)
      .groupByKey(_.bucket).count().toDF("partition_id", "urls_fetched")
    mergeStats.join(fetchedPerBucket, Seq("partition_id"), "full_outer")
      .na.fill(0L)
      .withColumn("batch_id", lit(bid))
      .select($"batch_id", $"partition_id", $"urls_discovered", $"urls_fetched",
        $"urls_deduped")
      .coalesce(1).write.mode("overwrite")
      .parquet(store.dataPath(s"lineage_v$bid"))

    // ---- delta-bucket write (claims' old buckets ∪ updates' new buckets ∪
    //      submission buckets; every other bucket carries forward) ----
    val deltaBuckets = claims.map(_._2.bucket)
      .union(updates.map(_.bucket))
      .union(mergeStats.select("partition_id").as[Int])
      .distinct().collect().toSet
    writeBuckets(f2, deltaBuckets, bid)

    // ---- S2 host_state update (fetch-attempted hosts only) ----
    val touched = resolved
      .filter(o => o.reason != CrawlDefaults.ReasonRobotsBlocked)
      .map(_.claim.host).distinct().toDF("host")
    val hs = hostState()
    val newHs = hs.toDF().join(touched.withColumn("t", lit(1)), Seq("host"), "full_outer")
      .select($"host",
        when($"t".isNotNull, lit(now)).otherwise($"last_fetch_at").as("last_fetch_at"),
        coalesce($"min_delay_ms", lit(CrawlDefaults.MinDelayMs)).as("min_delay_ms"))
      .withColumn("bucket", lit(0)) // placeholder, recomputed below
      .as[HostState].map(h => h.copy(bucket = (MurmurHash3.stringHash(h.host) & 0x7fffffff) % nb))
    writeHostState(newHs, Set.empty, bid)

    commit()
    claims.unpersist(); resolved.unpersist(); updates.unpersist()
  }

  /** Set-oriented Submit (F1): pre-aggregate in-batch duplicates with the
    * sequential-upsert-equivalent semantics — priority=GREATEST,
    * next_fetch_at=LEAST over all duplicates, insert-only fields from the
    * FIRST submission in (claim seq, link index) order — then merge into
    * the frontier (insert new; update pending; fetched/dead untouched).
    * Returns the merged frontier and per-bucket (discovered, deduped) stats.
    */
  private def mergeSubmissions(
      f1: Dataset[FrontierUrl],
      subs: Dataset[(Long, Int, Submission)]
  ): (Dataset[FrontierUrl], DataFrame) = {
    val nb = cfg.numBuckets
    val subAgg: Dataset[SubFirst] = subs
      .map { case (seq, li, s) =>
        (s.url_hash, s.priority, s.next_fetch_at, seq, li, s.url, s.host,
          s.source_id, s.origin, s.parent_url, s.depth)
      }
      .toDF("url_hash", "priority", "next_fetch_at", "seq", "li", "url",
        "host", "source_id", "origin", "parent_url", "depth")
      .groupBy($"url_hash")
      .agg(
        max($"priority").as("priority"),
        min($"next_fetch_at").as("next_fetch_at"),
        min_by(struct($"url", $"host", $"source_id", $"origin", $"parent_url",
          $"depth"), struct($"seq", $"li")).as("first")
      )
      .select($"url_hash", $"priority", $"next_fetch_at", $"first.url",
        $"first.host", $"first.source_id", $"first.origin", $"first.parent_url",
        $"first.depth")
      .withColumn("bucket", lit(0))
      .as[SubFirst]
      .map(s => s.copy(bucket = (MurmurHash3.stringHash(s.host) & 0x7fffffff) % nb))

    val now = clock
    val merged = f1.joinWith(subAgg, f1("url_hash") === subAgg("url_hash"), "full_outer")
      .map { case (fOrNull, sOrNull) =>
        (Option(fOrNull), Option(sOrNull)) match {
          case (Some(f), Some(s)) =>
            if (f.status == FrontierStatus.Pending)
              f.copy(priority = math.max(f.priority, s.priority),
                next_fetch_at = math.min(f.next_fetch_at, s.next_fetch_at),
                updated_at = now)
            else f
          case (Some(f), None) => f
          case (None, Some(s)) =>
            FrontierUrl(s.url, s.url_hash, s.host, s.source_id, s.origin,
              s.parent_url, s.depth, s.priority, FrontierStatus.Pending,
              s.next_fetch_at, None, 0, None, None, None, 0, None,
              s.next_fetch_at, now, now, s.bucket)
          case (None, None) => sys.error("unreachable full-outer row")
        }
      }

    val discovered = subAgg.join(f1.select("url_hash"), Seq("url_hash"), "left_anti")
      .groupBy($"bucket").count()
      .toDF("partition_id", "urls_discovered")
    val deduped = subAgg.join(f1.select("url_hash"), Seq("url_hash"), "left_semi")
      .groupBy($"bucket").count()
      .toDF("partition_id", "urls_deduped")
    val stats = discovered.join(deduped, Seq("partition_id"), "full_outer").na.fill(0L)
    (merged, stats)
  }
}
