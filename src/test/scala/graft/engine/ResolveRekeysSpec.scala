package graft.engine

import graft.SparkTestBase
import graft.core._
import graft.corpus.Corpus
import graft.state.SnapshotStore
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Direct unit coverage of the distributed re-key resolution's
  * FREED-HASH branches. A static redirect corpus can never produce them
  * (a candidate's chain follows THROUGH any redirecting target, so a
  * present new hash always belongs to a non-redirecting row — see the
  * resolveRekeys scaladoc), but the reference's sequential unique check
  * resolves them, so the engine keeps the general form: a member
  * contesting a present hash wins iff its "enabler" (the candidate that
  * re-keys that hash away) is itself accepted — settled by the chase
  * loop. Crafted candidate sets drive each branch against a seeded
  * frontier.
  */
class ResolveRekeysSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def mk(seedUrls: Seq[String]): CrawlEngine = {
    val store = new SnapshotStore(Files.createTempDirectory("rk").toString)
    val e = new CrawlEngine(spark, store, spark.emptyDataset[PageRow], Nil,
      EngineConfig(numBuckets = 8, maxDepth = 3))
    e.seed(seedUrls.zipWithIndex.map { case (u, i) => Seed(u, s"s$i") })
    e
  }

  private def cand(pos: Int, oldHash: String, oldHost: String,
      newUrl: String, e: CrawlEngine): (Int, Long, String, Int, String,
      String, String, Int) = {
    val newHash = UrlNormalizer.sha256Hex(newUrl)
    val newHost = UrlNormalizer.extractHost(newUrl).getOrElse(oldHost)
    (pos, 0L, oldHash, e.bucketOf(oldHost), newUrl, newHash, newHost,
      e.bucketOf(newHost))
  }

  private def toDf(rows: Seq[(Int, Long, String, Int, String, String,
      String, Int)]) =
    rows.toDF("negPrio", "nfa", "oldHash", "oldBucket", "newUrl", "newHash",
      "newHost", "newBucket")

  test("chase settles a member whose enabler is accepted; rejected enabler drops its member") {
    val u1 = Corpus.canonicalUrl("t1.example.org", "/x") // seeded: H1 live
    val u2 = Corpus.canonicalUrl("t2.example.org", "/y") // seeded: H2 live
    val e = mk(Seq(u1, u2))
    val h1 = UrlNormalizer.sha256Hex(u1)
    val h2 = UrlNormalizer.sha256Hex(u2)
    val f1 = Corpus.canonicalUrl("f1.example.org", "/fresh")
    val f2 = Corpus.canonicalUrl("f2.example.org", "/fresh")
    val rows = Seq(
      // group F1 (fresh): enabler E (oldHash H1) wins it uncontested
      cand(-10, h1, "t1.example.org", f1, e),
      // group H1 (present): M sits AFTER its enabler E → pending → chase
      // finds E accepted → M accepted
      cand(-5, "aa" * 32, "m.example.org", u1, e),
      // group F2 (fresh): e1 first wins; e2 (oldHash H2) loses → REJECTED
      cand(-10, "bb" * 32, "e1.example.org", f2, e),
      cand(-9, h2, "t2.example.org", f2, e),
      // group H2 (present): m2 pends on e2, which is rejected → m2 drops
      cand(-5, "cc" * 32, "m2.example.org", u2, e))
    val (accepted, buckets, cleanup) =
      e.resolveRekeys(toDf(rows), rows.map(_._8).toSet)
    val acc = accepted.select("oldHash", "newHash").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cleanup()
    assert(acc == Map(
      h1 -> UrlNormalizer.sha256Hex(f1), // enabler E
      ("aa" * 32) -> h1, // chased member M
      ("bb" * 32) -> UrlNormalizer.sha256Hex(f2)), // e1
      s"accepted set: $acc")
    // e2 (lost its fresh contest) and m2 (enabler rejected) fell back
    assert(!acc.contains(h2) && !acc.contains("cc" * 32))
    // reported buckets cover every accepted old+new bucket
    val expectBuckets = Set(
      e.bucketOf("t1.example.org"), e.bucketOf("f1.example.org"),
      e.bucketOf("m.example.org"), e.bucketOf("e1.example.org"),
      e.bucketOf("f2.example.org"))
    assert(expectBuckets.subsetOf(buckets), s"buckets $buckets")
  }

  test("member BEFORE its enabler falls back (hash not yet freed at its turn)") {
    val u1 = Corpus.canonicalUrl("t3.example.org", "/x")
    val e = mk(Seq(u1))
    val h1 = UrlNormalizer.sha256Hex(u1)
    val f1 = Corpus.canonicalUrl("f3.example.org", "/fresh")
    val rows = Seq(
      // member FIRST (claim order -20 < -10): at its turn H1 is live
      cand(-20, "dd" * 32, "m.example.org", u1, e),
      // enabler second: still re-keys H1 away to the fresh hash
      cand(-10, h1, "t3.example.org", f1, e))
    val (accepted, _, cleanup) =
      e.resolveRekeys(toDf(rows), rows.map(_._8).toSet)
    val acc = accepted.select("oldHash", "newHash").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cleanup()
    assert(acc == Map(h1 -> UrlNormalizer.sha256Hex(f1)), s"accepted: $acc")
  }
}
