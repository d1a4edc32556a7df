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
    maxBatches: Int = 100000,
    /** Seen-set bloom prefilter (north rule): submissions that the filter
      * proves unseen skip the dedup join entirely; possible hits go through
      * the exact anti-join, which stays authoritative. Results are
      * bit-identical with or without (CrawlParitySpec asserts it).
      */
    useBloomPrefilter: Boolean = false,
    bloomExpectedItems: Long = 1L << 20,
    bloomFpp: Double = 0.03
)

/** Engine-internal rows (kept flat for stable encoders). */
private[engine] final case class FetchState(
    claim: FrontierUrl,
    hops: Int,
    lookupHash: String,
    failReason: String, // "" = still fetching / ok
    page: Option[PageRow]
)

private[engine] final case class Resolved(
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

/** In-batch submission order key = (claim order, link index); claim order
  * is the defined tuple (priority DESC, next_fetch_at ASC, url_hash ASC).
  */
private[engine] final case class SubRow(
    negPrio: Int, nfa: Long, claimHash: String, li: Int, s: Submission)

private[engine] final case class RekeyCandidate(
    negPrio: Int, nfa: Long, oldHash: String, oldBucket: Int, newUrl: String,
    newHash: String, newHost: String, existsInTable: Boolean)

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

  /** Seen-set bloom prefilter, maintained incrementally: built from the
    * frontier at seed/resume, merged with each batch's inserted hashes.
    * The real-scale layout is one filter per bucket living beside the
    * bucket's parquet (SURVEY.md §2.9); a single driver-held filter is the
    * sandbox-size realization of the same contract — may-contain answers
    * only, exact anti-join remains authoritative.
    */
  private var seenBloom: Option[org.apache.spark.util.sketch.BloomFilter] = None

  private def initBloom(): Unit = if (cfg.useBloomPrefilter) {
    val bf = org.apache.spark.util.sketch.BloomFilter
      .create(cfg.bloomExpectedItems, cfg.bloomFpp)
    frontier().select("url_hash").as[String].collect().foreach(bf.putString)
    seenBloom = Some(bf)
  }

  /** One bucket function everywhere (driver, executors, merge logic). */
  def bucketOf(host: String): Int =
    (MurmurHash3.stringHash(host) & 0x7fffffff) % cfg.numBuckets

  private val robotsMap: Map[String, RobotsRules] = robotsRows.map { r =>
    r.host -> RobotsRules.fromResponse(r.body, r.status_code, cfg.userAgent)
  }.toMap
  private val robotsBc = spark.sparkContext.broadcast(robotsMap)

  /** Corpus pre-partitioned ONCE by the fetch-join key so the per-batch
    * lookup join never re-shuffles the corpus side.
    */
  private val pagesCached =
    pages.repartition(col("url_hash")).cache()

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

  /** Materialize the corpus cache + redirect topology up front (bench: the
    * corpus is the test stand-in for the web, not engine work to measure).
    */
  def warmCorpus(): Long = {
    val n = pagesCached.count()
    redirectBc
    n
  }

  var clock: Long = CrawlDefaults.VirtualEpochMs
  var batchId: Long = 0L
  private var bucketPaths: Map[Int, String] = Map.empty
  private var hostStatePath: String = ""

  // ----------------------------------------------------------------- state IO

  /** Current frontier snapshot: ONE multi-path parquet scan over the
    * manifest's bucket files (not a per-bucket union — a 32-way union
    * inflates every downstream Catalyst plan and analysis dominates the
    * micro-batch). The bucket column is recomputed from host on read; it
    * is a pure function of host, so path-carried and recomputed values
    * are identical.
    */
  def frontier(): Dataset[FrontierUrl] = {
    val paths = bucketPaths.toSeq.sortBy(_._1).map(_._2)
    if (paths.isEmpty) spark.emptyDataset[FrontierUrl]
    else {
      val nb = cfg.numBuckets
      val bucketUdf = udf((host: String) =>
        (MurmurHash3.stringHash(host) & 0x7fffffff) % nb)
      spark.read.schema(frontierNoBucketSchema).parquet(paths: _*)
        .withColumn("bucket", bucketUdf($"host")).as[FrontierUrl]
    }
  }

  private lazy val frontierSchema =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[FrontierUrl]().schema

  def hostState(): Dataset[HostState] =
    if (hostStatePath.isEmpty) spark.emptyDataset[HostState]
    else spark.read.parquet(hostStatePath).as[HostState]

  /** R2: frontier counts by status (frontier_repository.go:444-468).
    * Untyped groupBy so the scan prunes to the one column it needs.
    */
  def frontierStats(): Map[String, Long] =
    frontier().groupBy("status").count()
      .as[(String, Long)].collect().toMap

  /** R1: dashboard list — dynamic filters, ILIKE-style search, whitelisted
    * sort column, limit/offset (frontier_repository.go:315-432).
    */
  def frontierList(
      status: Option[String] = None,
      sourceId: Option[String] = None,
      host: Option[String] = None,
      origin: Option[String] = None,
      search: Option[String] = None,
      sortBy: String = "priority",
      limit: Int = 50,
      offset: Int = 0): Dataset[FrontierUrl] = {
    val sortCol = // whitelist-validated, like the reference
      if (Seq("priority", "next_fetch_at", "created_at").contains(sortBy)) sortBy
      else "priority"
    var df = frontier().toDF()
    status.foreach(v => df = df.filter($"status" === v))
    sourceId.foreach(v => df = df.filter($"source_id" === v))
    host.foreach(v => df = df.filter($"host" === v))
    origin.foreach(v => df = df.filter($"origin" === v))
    search.foreach(v => df = df.filter(lower($"url").contains(v.toLowerCase)))
    df.orderBy(desc(sortCol), asc("url_hash")) // deterministic tie-break
      .offset(math.max(offset, 0)).limit(math.max(limit, 0))
      .as[FrontierUrl]
  }

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
    // manifest: delta buckets point at the new files, others carry forward.
    // A delta bucket that ended the batch EMPTY (e.g. its only row re-keyed
    // to a host in another bucket) produced no bucket=b dir — it must be
    // DROPPED from the manifest, not pointed at a missing path (and its old
    // file is stale, so carrying it forward would resurrect dead rows).
    val written = deltaBuckets.filter(b =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(path, s"bucket=$b")))
    bucketPaths = (bucketPaths -- deltaBuckets) ++
      written.map(b => b -> s"$path/bucket=$b")
  }

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
          Some(SubRow(0, 0L, "", i, Submission(u, h, host, sd.source_id,
            FrontierOrigin.Manual, None, 0, Priorities.Default, clock)))
        case _ => None
      }
    }
    val subsDs = spark.createDataset(subs)
    val merged = mergeSubmissions(spark.emptyDataset[FrontierUrl], subsDs).map(_._1)
    val delta = merged.select("bucket").distinct().as[Int].collect().toSet
    writeBuckets(merged, delta, 0L)
    writeHostState(hostState(), Set.empty, 0L)
    commit()
    initBloom() // AFTER the seed snapshot: the filter must cover every row
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
        initBloom()
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

  private val trace = sys.env.contains("GRAFT_TRACE")
  private def timed[T](tag: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    if (trace) System.err.println(
      f"[graft-trace] batch=$batchId $tag%-16s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  private def runBatch(f0: Dataset[FrontierUrl], withReady: DataFrame): Unit = {
    val now = clock
    val bid = batchId
    val nb = cfg.numBuckets
    val maxRedirects = cfg.maxRedirects
    val maxRetries = cfg.maxRetries
    val maxDepth = cfg.maxDepth
    val robots = robotsBc

    // ---- S1 claim: top-1 per host over the eligible slice.
    // An argmin AGGREGATION (min_by over the claim-order tuple) rather than
    // a window row_number: hash aggregation does map-side partial combine,
    // so a skewed host with 10^7 eligible rows reduces locally on every
    // partition before the shuffle — the window form would sort that
    // host's entire row set in one task. ----
    val eligible = withReady
      .filter($"next_fetch_at" <= now && $"host_ready" <= now)
      .drop("host_ready", "ready_at", "last_fetch_at", "min_delay_ms")
    val fields = frontierSchema.fieldNames
    val claims: Dataset[FrontierUrl] = eligible
      .groupBy($"host".as("claim_host"))
      .agg(min_by(struct(fields.map(col): _*),
        struct((-$"priority").as("np"), $"next_fetch_at", $"url_hash")).as("top"))
      .select($"top.*")
      .as[FrontierUrl]
      .localCheckpoint() // truncate lineage: every downstream plan reuses this

    // claim log (the crawl-ordering trace; in-batch order = the defined
    // tuple, so no global sort is materialized here). Sink writes that are
    // independent of the merge path run as concurrent Spark jobs and are
    // awaited before the snapshot commit.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val claimLogF = Future(timed("claim_log") {
      claims.map { r =>
        ClaimLogEntry(bid, r.url_hash, r.url, r.host, r.priority, r.next_fetch_at)
      }.toDF().write.mode("overwrite")
        .parquet(store.dataPath(s"claim_log_v$bid"))
    })

    // ---- X2 robots gate (before fetch; blocked rows never touch the host)
    //      + X3 redirect-chain resolution (fetcher/redirect.go:16-23) in one
    //      distributed pass using the broadcast redirect topology ----
    val redirects = redirectBc
    val gated: Dataset[FetchState] = claims.map { r =>
      val path = GoUrl.parse(r.url).map(_.path).getOrElse("/")
      val allowed = robots.value.getOrElse(r.host, RobotsRules.AllowAll).isAllowed(path)
      if (!allowed) FetchState(r, 0, "", CrawlDefaults.ReasonRobotsBlocked, None)
      else {
        var hash = r.url_hash
        var hops = 0
        var fail = ""
        while (fail.isEmpty && redirects.value.contains(hash)) {
          hops += 1
          if (hops > maxRedirects) fail = CrawlDefaults.ReasonTooManyRedirects
          else hash = UrlNormalizer.sha256Hex(redirects.value(hash))
        }
        FetchState(r, hops, hash, fail, None)
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
        Resolved(r, "dead", s.failReason, "", "", "", Nil, Nil, "")
      else if (s.failReason.nonEmpty) // fetch_error / too_many_redirects
        Resolved(r, "failed", s.failReason, "", "", "", Nil, Nil, "")
      else {
        val p = s.page.get
        p.status_code match {
          case 200 =>
            if (!ContentUrl.isHtmlContent(p.content_type))
              Resolved(r, "dead", CrawlDefaults.ReasonUnsupportedContentType,
                "", "", "", Nil, Nil, p.url)
            else if (ContentUrl.isBinaryUrl(r.url))
              Resolved(r, "dead", CrawlDefaults.ReasonBinaryUrl,
                "", "", "", Nil, Nil, p.url)
            else if (!p.extract_ok)
              Resolved(r, "dead", CrawlDefaults.ReasonExtractFailed,
                "", "", "", Nil, Nil, p.url)
            else {
              val contentHash = UrlNormalizer.sha256Hex(
                p.spans.filter(_.kind == "text").map(_.text).mkString("\n"))
              Resolved(r, "fetched", "", p.url, contentHash,
                UrlNormalizer.sha256Hex(r.url), p.spans, p.links, p.url)
            }
          case 304 =>
            Resolved(r, "fetched", "", p.url, "", "", Nil, Nil, p.url)
          case 404 =>
            Resolved(r, "dead", CrawlDefaults.ReasonNotFound,
              "", "", "", Nil, Nil, p.url)
          case c if c == 429 || c >= 500 =>
            Resolved(r, "failed", s"http status $c", "", "", "", Nil, Nil, p.url)
          case c =>
            Resolved(r, "failed", s"unexpected http status $c",
              "", "", "", Nil, Nil, p.url)
        }
      }
    }.localCheckpoint()

    // ---- X7 final-URL re-key with collision fallback (23505 semantics) ----
    val rekeyCandidates = resolved.flatMap { o =>
      if (o.outcome != "fetched" || o.finalUrl.isEmpty) None
      else (UrlNormalizer.normalize(o.finalUrl), UrlNormalizer.normalize(o.claim.url)) match {
        case (Right(f), Right(c)) if f != c =>
          val nh = UrlNormalizer.sha256Hex(f)
          val host = UrlNormalizer.extractHost(f).getOrElse(o.claim.host)
          Some(RekeyCandidate(-o.claim.priority, o.claim.next_fetch_at,
            o.claim.url_hash, o.claim.bucket, f, nh, host, existsInTable = false))
        case _ => None
      }
    }
    val candWithExists = timed("rekey_collect") { rekeyCandidates
      .joinWith(f0, rekeyCandidates("newHash") === f0("url_hash"), "left_outer")
      .map { case (c, fOrNull) => c.copy(existsInTable = fOrNull != null) }
      .collect().sortBy(c => (c.negPrio, c.nfa, c.oldHash)) }
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
    }.localCheckpoint()

    // ---- docs sink (ES-index analog; one doc per fetched 200 page) ----
    val docsF = Future(timed("docs_write") {
      resolved.filter(o => o.docId.nonEmpty)
        .map(o => (o.docId, o.claim.url, o.spans, bid))
        .toDF("doc_id", "url", "spans", "batch_id")
        .write.mode("overwrite").parquet(store.dataPath(s"docs_v$bid"))
    })

    // ---- F3 link discovery → submissions ----
    val submissions: Dataset[SubRow] = resolved.flatMap { o =>
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
              Some(SubRow(-o.claim.priority, o.claim.next_fetch_at,
                o.claim.url_hash, li, Submission(u, h, host, o.claim.source_id,
                  FrontierOrigin.Spider, Some(o.pageUrl), o.claim.depth + 1,
                  prio, now)))
            case _ => None
          }
        }
      }
    }

    // ---- apply outcomes then submissions (the batch linearization) ----
    val claimedKeys = claims.map(_.url_hash).toDF("url_hash")
    // NB: a using-column join moves the key column first; re-select the
    // canonical field order before the positional union with `updates`.
    val f1 = f0.join(claimedKeys, Seq("url_hash"), "left_anti")
      .select(frontierSchema.fieldNames.map(col): _*)
      .as[FrontierUrl].union(updates)
    // Re-keyed hashes enter the bloom BEFORE the merge: the filter must be
    // a superset of f1's url_hashes when mergeSubmissions broadcasts it, or
    // a same-batch submission matching a just-re-keyed final URL would test
    // "definitely unseen" and insert a duplicate row beside the re-keyed one.
    seenBloom.foreach { bf => rekeyOk.values.foreach(c => bf.putString(c.newHash)) }
    val merged = mergeSubmissions(f1, submissions).persist()
    // keep the prefilter in sync with this batch's inserts
    seenBloom.foreach { bf =>
      merged.filter(_._2 == "insert").map(_._1.url_hash).collect()
        .foreach(bf.putString)
    }
    val f2 = merged.map(_._1)

    // ---- per-bucket lineage (north rule) + delta buckets from TWO tiny
    //      collected aggregates: one over the tagged merge output, one
    //      over the claim updates ----
    val changedAgg = timed("merge_agg") {
      merged.filter(_._2 != "keep")
        .map { case (r, tag) => (r.bucket, tag) }
        .groupByKey(identity).count().collect()
    }
    val updAgg = timed("upd_agg") {
      updates.map(u => (u.bucket, u.status))
        .groupByKey(identity).count().collect()
    }
    val fetchedBy = updAgg.collect { case ((b, st), c) if st == FrontierStatus.Fetched => b -> c }.toMap
    val insertedBy = changedAgg.collect { case ((b, "insert"), c) => b -> c }.toMap
    val dedupBy = changedAgg.collect { case ((b, "dedup"), c) => b -> c }.toMap
    val lineageRows = (fetchedBy.keySet ++ insertedBy.keySet ++ dedupBy.keySet)
      .toSeq.sorted.map { b =>
        LineageRow(bid, b, insertedBy.getOrElse(b, 0L), fetchedBy.getOrElse(b, 0L),
          dedupBy.getOrElse(b, 0L))
      }
    timed("lineage_write") {
      spark.createDataset(lineageRows).toDF().coalesce(1)
        .write.mode("overwrite").parquet(store.dataPath(s"lineage_v$bid"))
    }

    // delta = updates' (new) buckets ∪ re-keyed rows' old buckets ∪
    // inserted/merged submission buckets; every other bucket carries forward
    val deltaBuckets = updAgg.map(_._1._1).toSet ++ insertedBy.keySet ++
      dedupBy.keySet ++ rekeyOk.values.map(_.oldBucket)
    timed("frontier_write") { writeBuckets(f2, deltaBuckets, bid) }

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
    timed("host_write") { writeHostState(newHs, Set.empty, bid) }

    // all sinks must be durable before the snapshot pointer moves
    Await.result(claimLogF, Duration.Inf)
    Await.result(docsF, Duration.Inf)
    commit()
    merged.unpersist()
  }

  /** Set-oriented Submit (F1): pre-aggregate in-batch duplicates with the
    * sequential-upsert-equivalent semantics — priority=GREATEST,
    * next_fetch_at=LEAST over all duplicates, insert-only fields from the
    * FIRST submission in (claim order, link index) order — then merge into
    * the frontier (insert new; update pending; fetched/dead untouched).
    * Each output row is tagged insert | dedup | keep for lineage.
    */
  private def mergeSubmissions(
      f1: Dataset[FrontierUrl],
      subs: Dataset[SubRow]
  ): Dataset[(FrontierUrl, String)] = {
    val nb = cfg.numBuckets
    val bloomBc = seenBloom.map(spark.sparkContext.broadcast(_))
    val subAgg: Dataset[SubFirst] = subs
      .map(r => (r.s.url_hash, r.s.priority, r.s.next_fetch_at, r.negPrio,
        r.nfa, r.claimHash, r.li, r.s.url, r.s.host, r.s.source_id,
        r.s.origin, r.s.parent_url, r.s.depth))
      .toDF("url_hash", "priority", "next_fetch_at", "negPrio", "nfa",
        "claimHash", "li", "url", "host", "source_id", "origin",
        "parent_url", "depth")
      .groupBy($"url_hash")
      .agg(
        max($"priority").as("priority"),
        min($"next_fetch_at").as("next_fetch_at"),
        min_by(struct($"url", $"host", $"source_id", $"origin", $"parent_url",
          $"depth"), struct($"negPrio", $"nfa", $"claimHash", $"li")).as("first")
      )
      .select($"url_hash", $"priority", $"next_fetch_at", $"first.url",
        $"first.host", $"first.source_id", $"first.origin", $"first.parent_url",
        $"first.depth")
      .withColumn("bucket", lit(0))
      .as[SubFirst]
      .map(s => s.copy(bucket = (MurmurHash3.stringHash(s.host) & 0x7fffffff) % nb))

    val now = clock
    // bloom split: definitely-new submissions bypass the dedup join —
    // that join's probe side shrinks to the maybe-seen subset
    val (subJoin, subFresh) = bloomBc match {
      case Some(bf) =>
        (subAgg.filter(s => bf.value.mightContainString(s.url_hash)),
          subAgg.filter(s => !bf.value.mightContainString(s.url_hash)))
      case None => (subAgg, spark.emptyDataset[SubFirst])
    }
    val freshInserts = subFresh.map { s =>
      (FrontierUrl(s.url, s.url_hash, s.host, s.source_id, s.origin,
        s.parent_url, s.depth, s.priority, FrontierStatus.Pending,
        s.next_fetch_at, None, 0, None, None, None, 0, None,
        s.next_fetch_at, now, now, s.bucket), "insert")
    }
    freshInserts.union(
      f1.joinWith(subJoin, f1("url_hash") === subJoin("url_hash"), "full_outer")
      .map { case (fOrNull, sOrNull) =>
        (Option(fOrNull), Option(sOrNull)) match {
          case (Some(f), Some(s)) =>
            if (f.status == FrontierStatus.Pending)
              (f.copy(priority = math.max(f.priority, s.priority),
                next_fetch_at = math.min(f.next_fetch_at, s.next_fetch_at),
                updated_at = now), "dedup")
            else (f, "dedup")
          case (Some(f), None) => (f, "keep")
          case (None, Some(s)) =>
            (FrontierUrl(s.url, s.url_hash, s.host, s.source_id, s.origin,
              s.parent_url, s.depth, s.priority, FrontierStatus.Pending,
              s.next_fetch_at, None, 0, None, None, None, 0, None,
              s.next_fetch_at, now, now, s.bucket), "insert")
          case (None, None) => sys.error("unreachable full-outer row")
        }
      })
  }
}
