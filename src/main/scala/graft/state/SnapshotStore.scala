package graft.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Parquet + atomic snapshot-manifest table store — the sandbox stand-in for
  * Iceberg (SURVEY.md 7.6: no Iceberg/Delta jars ship with /opt/spark/jars,
  * so the engine implements the Iceberg properties it actually relies on:
  * atomic commit, snapshot isolation, per-partition (bucket) file tracking
  * with carry-forward of untouched buckets, and resume-from-last-snapshot).
  *
  * Layout:
  * {{{
  * root/
  *   data/<table>_b<bucket>_v<batch>/   (parquet dir written by Spark)
  *   data/<table>_v<batch>/             (unbucketed small tables)
  *   manifest_<batchId>.json            (atomic rename commit)
  * }}}
  *
  * A manifest names, for every table, either a single path or a
  * bucket-to-path map. Commit = write temp file + ATOMIC_MOVE rename; the
  * newest manifest wins on resume (mirrors Iceberg's snapshot pointer).
  * Mid-batch crashes leave only orphan data dirs — never a torn manifest —
  * which realizes the reference's stale-claim recovery semantics
  * (frontier_repository.go:492-512) for free: an uncommitted batch simply
  * never happened.
  *
  * The frontier's settled side is a per-bucket APPEND-ONLY segment chain
  * ("<b>/s0".."<b>/sN"): a batch commit appends data files and rewrites
  * only the manifest — exactly Iceberg's append snapshot (new data files
  * + new manifest list; existing files untouched). Segment compaction is
  * Iceberg's rewrite-data-files action (new compacted file replaces N
  * small ones in the next manifest; old files stay until snapshot
  * expiry), and [[vacuum]] is expire_snapshots: liveness is computed from
  * the KEPT manifests, so chains referenced across many snapshots
  * survive until no kept snapshot names them.
  */
final class SnapshotStore(rootDir: String) {
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root.resolve("data"))

  final case class Manifest(
      batchId: Long,
      clock: Long,
      // frontier partition key -> leaf data path; the key is
      // "<bucket>/p" (pending slice) or "<bucket>/s" (settled slice) —
      // the status split is what lets claim reads touch only the
      // eligible files (the reference's partial index WHERE
      // status='pending', crawler/migrations/014:29).
      buckets: Map[String, String],
      tables: Map[String, String] // small tables (host_state, ...) -> path
  )

  def dataPath(name: String): String =
    root.resolve("data").resolve(name).toString

  // --- tiny hand-rolled flat JSON (store-controlled keys; no deps) ---
  private def render(m: Manifest): String = {
    val b = m.buckets.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString(",")
    val t = m.tables.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString(",")
    s"""{"batchId":${m.batchId},"clock":${m.clock},"buckets":{$b},"tables":{$t}}"""
  }

  /** Minimal parser for the exact shape `render` emits. */
  private def parse(s: String): Manifest = {
    def longField(name: String): Long = {
      val p = ("\"" + name + "\":(-?\\d+)").r
      p.findFirstMatchIn(s).map(_.group(1).toLong)
        .getOrElse(sys.error(s"manifest missing $name"))
    }
    def mapField(name: String): Map[String, String] = {
      val start = s.indexOf("\"" + name + "\":{")
      if (start < 0) Map.empty
      else {
        val open = s.indexOf('{', start)
        val close = s.indexOf('}', open)
        val body = s.substring(open + 1, close)
        if (body.trim.isEmpty) Map.empty
        else body.split(",").map { kv =>
          // keys/values are store-generated names (no escapes possible)
          val Array(k, v) = kv.split(":", 2)
          def unq(x: String) = x.trim.stripPrefix("\"").stripSuffix("\"")
          unq(k) -> unq(v)
        }.toMap
      }
    }
    Manifest(longField("batchId"), longField("clock"),
      mapField("buckets"), mapField("tables"))
  }

  /** Atomic commit: temp write + rename (the Iceberg snapshot-pointer move). */
  def commit(m: Manifest): Unit = {
    val tmp = root.resolve(s".manifest_${m.batchId}.tmp")
    Files.writeString(tmp, render(m))
    Files.move(tmp, root.resolve(f"manifest_${m.batchId}%012d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Latest committed snapshot, if any (resume point). */
  def latest(): Option[Manifest] = {
    if (!Files.exists(root)) return None
    val manifests = Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.startsWith("manifest_")).toSeq
    if (manifests.isEmpty) None
    else Some(parse(Files.readString(manifests.maxBy(_.getFileName.toString))))
  }

  /** Iceberg-style snapshot expiry: keep the last `keepLast` manifests,
    * delete older manifests plus any STATE data dirs (frontier buckets /
    * host_state) no kept manifest references — carry-forward means an old
    * version's file can still be live, so liveness is computed from the
    * kept manifests, never from age. Append-only outputs (claim_log, docs,
    * lineage) are products of the crawl, not state, and are never touched.
    */
  def vacuum(keepLast: Int): Int = {
    val manifests = Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.startsWith("manifest_")).toSeq
      .sortBy(_.getFileName.toString)
    if (manifests.size <= keepLast) return 0
    val (drop, keep) = manifests.splitAt(manifests.size - keepLast)
    val live: Set[String] = keep.flatMap { p =>
      val m = parse(Files.readString(p))
      m.buckets.values.map(v => Paths.get(v).normalize.toString) ++
        m.tables.values.map(v => Paths.get(v).normalize.toString)
    }.toSet
    // A dir is live when it IS a live leaf or an ancestor of one (manifest
    // leaves may sit one or two partition levels below the version dir).
    def isLive(p: Path): Boolean = {
      val s = p.normalize.toString
      live.contains(s) || live.exists(_.startsWith(s + "/"))
    }
    var removed = 0
    val dataDir = root.resolve("data")
    Files.list(dataDir).iterator().asScala.toSeq.foreach { d =>
      val name = d.getFileName.toString
      // STATE dirs: frontier buckets, host-state buckets, the seen-filter
      // sidecars (bloom_v*), and the versioned curation tables (each
      // upsert rewrites the whole table under a new _c<N> dir — without
      // pruning, curation churn grows disk unboundedly) — all
      // carry-forward tables whose liveness comes from the kept manifests.
      val isState = name.startsWith("frontier_v") ||
        name.startsWith("host_state_v") || name.startsWith("bloom_v") ||
        name.startsWith("sources_c") || name.startsWith("domain_states_c")
      if (isState) {
        if (!isLive(d)) { deleteRecursively(d); removed += 1 }
        else if (name.startsWith("bloom_v")) {
          // sidecar dirs hold one flat file per touched bucket; prune the
          // files individual newer snapshots have superseded
          Files.list(d).iterator().asScala.toSeq.foreach { f =>
            if (!live.contains(f.normalize.toString)) {
              Files.delete(f); removed += 1
            }
          }
        } else {
          // prune dead partition subtrees inside partially-live versions
          def prune(dir: Path): Unit =
            Files.list(dir).iterator().asScala.toSeq.foreach { sub =>
              val n = sub.getFileName.toString
              if (Files.isDirectory(sub) && (n.contains("=") || n.forall(_.isDigit))) {
                if (!isLive(sub)) { deleteRecursively(sub); removed += 1 }
                else if (!live.contains(sub.normalize.toString)) prune(sub)
              }
            }
          prune(d)
        }
      }
    }
    drop.foreach(Files.delete)
    removed
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.delete(p)
  }

  /** Drop snapshots after batchId (used by tests to simulate a crash). */
  def truncateAfter(batchId: Long): Unit =
    Files.list(root).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("manifest_") &&
        n.stripPrefix("manifest_").stripSuffix(".json").toLong > batchId
      }
      .toSeq
      .foreach(Files.delete)
}
