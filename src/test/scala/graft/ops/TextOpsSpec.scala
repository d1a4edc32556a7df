package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics tests for the training-data operators (the cross-engine value
  * parity is separately enforced by the driver's DuckDB oracle).
  */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L), // exact dup
    (2L, "the quick brown fox jumps over the lazy cat", "en", "s0", 43L), // near dup
    (3L, "completely different text about gardens and rivers here", "en", "s1", 55L),
    (4L, "le chat est sur la table et la vie est belle", "fr", "s0", 44L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("spanize: every third token is a media span; offsets are positions") {
    val spans = TextOps.flattenSpans(TextOps.spanize(docs.filter($"doc_id" === 0)))
      .orderBy("offset").collect()
    assert(spans.length == 9)
    assert(spans.map(_.getInt(1)).toSeq == (0 until 9))
    assert(spans(2).getString(2) == "media" && spans(2).getString(3) == "")
    assert(spans(2).getString(4).startsWith("asset://"))
    assert(spans(0).getString(2) == "text" && spans(0).getString(3) == "the")
    assert(spans(0).getString(4) == "")
  }

  test("dedupExact keeps min doc_id per identical text") {
    val out = TextOps.dedupExact(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 2L, 3L, 4L)) // 1 deduped into 0
    assert(out.head.getLong(1) == 2L) // dup_count of the duplicated text
  }

  test("minhash: identical docs share full signature; near-dups share some") {
    val sig = TextOps.minhashSignatures(docs, 8, 3)
      .collect().groupBy(_.getLong(0))
      .map { case (d, rows) => d -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(sig(0L) == sig(1L)) // exact dup: identical signature
    val shared02 = sig(0L).zip(sig(2L)).count { case (a, b) => a == b }
    assert(shared02 > 0 && shared02 < 8, s"near-dup shares some bands: $shared02")
    assert(sig(0L) != sig(3L))
  }

  test("native minhash expression ≡ declarative SQL form (incl. edge docs)") {
    val edge = Seq(
      (10L, "", "en", "s0", 0L), // empty text
      (11L, "one", "en", "s0", 3L), // fewer tokens than shingle length
      (12L, "a b", "en", "s0", 3L),
      (13L, "trailing space ", "en", "s0", 15L), // trailing empty token
      (14L, "naïve café déjà-vu unicode ünïcode test", "fr", "s0", 39L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val both = docs.unionByName(edge)
    val native = both.select($"doc_id",
      TextOps.minhashSignatureArray(3, 8).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sql = both.select($"doc_id",
      expr(TextOps.minhashSignatureSql(3, 8)).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == sql)
  }

  test("native shingles expression ≡ declarative HOF form (incl. edge docs)") {
    val edge = Seq(
      (10L, "", "en", "s0", 0L), // empty text → one empty-token shingle
      (11L, "one", "en", "s0", 3L), // fewer tokens than shingle length
      (12L, "a b", "en", "s0", 3L),
      (13L, "trailing space ", "en", "s0", 15L), // trailing empty token
      (14L, "naïve café déjà-vu unicode ünïcode test", "fr", "s0", 39L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val both = docs.unionByName(edge)
    for (k <- Seq(1, 3, 5)) {
      val native = both.select($"doc_id", TextOps.shingles($"text", k).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val sql = both.select($"doc_id", expr(TextOps.shinglesSql(k)).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native == sql, s"k=$k")
    }
  }

  test("native spanize expression ≡ declarative HOF form (incl. edge docs)") {
    val edge = Seq(
      (10L, "", "en", "s0", 0L),
      (11L, "one two three four five six seven", "en", "s0", 33L),
      (13L, "trailing space ", "en", "s0", 15L),
      (14L, "naïve café déjà-vu unicode ünïcode test", "fr", "s0", 39L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val both = docs.unionByName(edge)
    val native = TextOps.flattenSpans(TextOps.spanize(both))
      .orderBy("doc_id", "offset").collect().map(_.toSeq).toSeq
    val sql = TextOps.flattenSpans(
        both.select($"doc_id", expr(TextOps.spanizeSql).as("spans")))
      .orderBy("doc_id", "offset").collect().map(_.toSeq).toSeq
    assert(native == sql)
  }

  test("native vector expressions ≡ declarative HOF forms (cosine, LSH buckets, IVF assign)") {
    import graft.functions.TextExpressions
    // deterministic vectors exercising the edge semantics: negatives,
    // exact .5 quantization boundaries ((2k+1)/2^21 is float-exact, where
    // HALF_UP and Math.round diverge for negatives), zero vectors, and a
    // mix of magnitudes
    def vec(seed: Long, dim: Int): Seq[Float] = Seq.tabulate(dim) { d =>
      val h = (seed * 31 + d) * 2654435761L
      (h % 7) match {
        case 0 => (2 * (h % 11) + 1) / 2097152.0f // +.5 boundary
        case 1 | -1 => -(2 * (math.abs(h) % 11) + 1) / 2097152.0f // -.5 boundary
        case _ => ((h % 1000) / 500.0f) - 1.0f
      }
    }
    val emb = (0L until 40L).map { i =>
      (i, if (i == 7) Seq.fill(16)(0.0f) else vec(i, 16)) // incl. zero-norm
    }.toDF("vec_id", "embedding")
    val v2 = emb.select($"vec_id",
      expr("transform(embedding, x -> cast(x as double))").as("v"))

    // cosine: native kernel vs the declarative try_divide pipeline
    val pairs = v2.as("a").crossJoin(v2.as("b"))
      .select($"a.vec_id".as("ai"), $"b.vec_id".as("bi"),
        round(coalesce(TextExpressions.cosine_sim($"a.v", $"b.v"), lit(-1.0)), 6)
          .as("nat"),
        round(expr(TextOps.cosineSql("a.v", "b.v")), 6).as("decl"))
    assert(pairs.filter($"nat" =!= $"decl").count() == 0)

    // LSH buckets: native vs the broadcast-sign-matrix HOF form, both
    // salt modes (single-table "p:d" and per-table "t:p:d")
    val dim = 16; val tables = 3; val planes = 5
    val wT = spark.range(1).select(expr(
      s"""transform(sequence(0, ${tables - 1}), t ->
            transform(sequence(0, ${planes - 1}), p ->
              transform(sequence(0, $dim - 1), d ->
                CASE WHEN cast(conv(substring(md5(concat(t, ':', p, ':', d)), 1, 15), 16, 10) as bigint) % 2 = 0
                     THEN cast(1 as bigint) ELSE cast(-1 as bigint) END)))""").as("w"))
    val hofT = emb.crossJoin(broadcast(wT)).select($"vec_id", expr(
      s"""transform(sequence(0, ${tables - 1}), t ->
            aggregate(sequence(0, ${planes - 1}), cast(0 as bigint), (acc, p) ->
              acc + CASE WHEN
                aggregate(
                  zip_with(embedding, w[t][p], (x, s) ->
                    cast(round(cast(x as double) * 1048576) as bigint) * s),
                  cast(0 as bigint), (a, z) -> a + z) > 0
              THEN shiftleft(cast(1 as bigint), p) ELSE cast(0 as bigint) END))""")
      .as("b")).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val natT = emb.select($"vec_id",
      TextExpressions.lsh_buckets($"embedding", tables, planes, dim, tableSalt = true)
        .as("b")).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(natT == hofT)
    val w1 = spark.range(1).select(expr(
      s"""transform(sequence(0, ${planes - 1}), p ->
            transform(sequence(0, $dim - 1), d ->
              CASE WHEN cast(conv(substring(md5(concat(p, ':', d)), 1, 15), 16, 10) as bigint) % 2 = 0
                   THEN cast(1 as bigint) ELSE cast(-1 as bigint) END))""").as("w"))
    val hof1 = emb.crossJoin(broadcast(w1)).select($"vec_id", expr(
      s"""aggregate(sequence(0, ${planes - 1}), cast(0 as bigint), (acc, p) ->
            acc + CASE WHEN
              aggregate(
                zip_with(embedding, w[p], (x, s) ->
                  cast(round(cast(x as double) * 1048576) as bigint) * s),
                cast(0 as bigint), (a, v) -> a + v) > 0
            THEN shiftleft(cast(1 as bigint), p) ELSE cast(0 as bigint) END)""")
      .as("b")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nat1 = emb.select($"vec_id",
      TextExpressions.lsh_buckets($"embedding", 1, planes, dim, tableSalt = false)
        .getItem(0).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nat1 == hof1)

    // IVF assignment: native argmax vs the aggregate-HOF form (zero-norm
    // row included: all-(-1) ties must resolve to the lowest cid)
    val cents = v2.filter($"vec_id" < 6)
      .select($"vec_id".as("cid"), $"v".as("cv"))
    val cb = cents.groupBy().agg(expr("sort_array(collect_list(struct(cid, cv)))").as("cb"))
    val hofAssign = v2.crossJoin(broadcast(cb)).select($"vec_id", expr(
      s"""aggregate(
            transform(cb, ce -> named_struct('cid', ce.cid,
              'c', round(${TextOps.cosineSql("v", "ce.cv")}, 6))),
            named_struct('cid', cast(-1 as bigint), 'c', cast(-2.0 as double)),
            (best, ce2) -> CASE WHEN ce2.c > best.c THEN ce2 ELSE best END
          ).cid""").as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val natAssign = v2.crossJoin(broadcast(cb)).select($"vec_id",
      TextExpressions.ivf_assign($"v", $"cb").as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(natAssign == hofAssign)
  }

  test("minhash LSH pairs surface the exact and near duplicates") {
    val pairs = TextOps.minhashLshPairs(docs, 8, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup pair found: $pairs")
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((3L, 4L)))
  }

  test("simhash: identical texts equal; near-dups within small hamming distance") {
    val sh = TextOps.simhash16(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    val hamming02 = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    val hamming03 = java.lang.Long.bitCount(sh(0L) ^ sh(3L))
    assert(hamming02 < hamming03, s"near-dup closer: $hamming02 vs $hamming03")
  }

  test("ngram jaccard: near-dup pair scored, disjoint docs absent") {
    val pairs = TextOps.ngramJaccardPairs(docs, 3, 0.05).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("stop-shingle cut: a hot shingle drops from intersections AND sizes") {
    // 10 docs share the hot phrase "hot common phrase"; docs 20/21 also
    // share a rare tail. With maxDocFreq < 10 the hot shingle must stop
    // contributing: 20/21's Jaccard is computed over their OTHER shingles
    // only, and hot-phrase-only doc pairs vanish entirely.
    val hot = "hot common phrase"
    val many = (30L until 38L).map(i => (i, s"$hot filler$i", "en", "s0", 20L))
    val d = (Seq(
      (20L, s"$hot rare tail one two", "en", "s0", 30L),
      (21L, s"$hot rare tail one three", "en", "s0", 30L)) ++ many)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cut = TextOps.ngramJaccardPairs(d, 3, 0.01, maxDocFreq = 5L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // doc 20: shingles (cut) = {hot rare tail→no wait} — compute: tokens
    // "hot common phrase rare tail one two" → 3-shingles: "hot common
    // phrase"(df=10, CUT), "common phrase rare"(df=2), "phrase rare
    // tail"(df=2), "rare tail one"(df=2), "tail one two"(df=1) ⇒ sz=4;
    // doc 21 symmetric; intersection = 3 ⇒ jaccard = 3/(4+4-3) = 0.6
    assert(cut((20L, 21L)) == 0.6, s"jaccard over informative shingles: $cut")
    // no hot-phrase-only pairs survive the cut
    assert(!cut.keySet.exists(p => p._1 >= 30L),
      s"hot-shingle pairs excluded: ${cut.keySet}")
    // without the cut the hot shingle DOES pair the filler docs
    val raw = TextOps.ngramJaccardPairs(d, 3, 0.01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(raw.exists(p => p._1 >= 30L), "corpus actually exercises the cut")
  }

  test("minhash LSH maxBucket: a degenerate bucket stops emitting pairs") {
    // 12 identical docs land in the SAME bucket in every band; with
    // maxBucket = 8 the bucket is cut and no pairs emit, while a normal
    // near-dup pair in a small bucket survives.
    val clones = (50L until 62L).map(i => (i, "identical boilerplate page text", "en", "s0", 30L))
    val d = (clones ++ Seq(
      (70L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
      (71L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cut = TextOps.minhashLshPairs(d, 8, 4, 3, maxBucket = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cut.contains((70L, 71L)), "small-bucket pair survives")
    assert(!cut.exists(p => p._1 < 62L), s"degenerate bucket cut: $cut")
    val raw = TextOps.minhashLshPairs(d, 8, 4, 3, maxBucket = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(raw.exists(p => p._1 < 62L), "corpus actually exercises the cap")
  }

  test("cosine top-k: self-similar vectors rank first, ties broken by vec_id") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(0.0f, 0.95f, 0.05f), 1)
    ).toDF("vec_id", "embedding", "label")
    val top = TextOps.cosineTopK(emb, Seq(0L), 2).orderBy("rn").collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(1L, 2L).take(2).updated(1, top(1).getLong(2)))
    assert(top(0).getLong(2) == 1L) // nearest neighbour of e_x is the 0.9/0.1 vector
  }

  test("LSH buckets: identical vectors share a bucket, orthogonal ones may not") {
    val emb = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f), 0),
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f), 0),
      (2L, Array(-4.0f, 3.0f, -2.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val b = TextOps.lshBuckets(emb, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L))
  }

  test("ivf top-k: probed lists find co-directional neighbours, rank by cosine") {
    // 8 vectors in 2 clear direction clusters; nlist=2 → the codebook is
    // vec 0 (x-ish) and vec 1 (y-ish); nprobe=1 probes only the query's
    // own cluster, which contains every true neighbour here.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.95f, 0.05f)), (3L, Array(0.9f, 0.1f)),
      (4L, Array(0.05f, 0.95f)), (5L, Array(0.1f, 0.9f)),
      (6L, Array(0.99f, 0.01f)), (7L, Array(0.01f, 0.99f))
    ).toDF("vec_id", "embedding")
    val top = TextOps.ivfTopK(emb, Seq(0L, 1L), 3, nlist = 2, nprobe = 1)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(top(0L) == Seq(6L, 2L, 3L), s"x-cluster neighbours in cosine order: $top")
    assert(top(1L) == Seq(7L, 4L, 5L), s"y-cluster neighbours in cosine order: $top")
  }

  test("ivf top-k: zero-norm vector lands in the lowest-cid list (DuckDB -1 convention)") {
    // vec 5 has zero norm → every centroid cosine is -1.0 (cosineSql
    // mirrors DuckDB's measured list_cosine_similarity convention; plain
    // `/` would throw DIVIDE_BY_ZERO under ANSI mode). All-(-1) ties
    // resolve to the lowest cid on both engines, so the row assigns to
    // cid 0 and must surface in a cid-0 probe — never vanish, never
    // crash the query.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.1f, 0.9f)),
      (5L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = TextOps.ivfTopK(emb, Seq(0L), 4, nlist = 2, nprobe = 1)
      .collect().map(r => r.getLong(2)).toSet
    assert(got.contains(5L), s"zero-norm vector must stay indexed: $got")
    assert(got.contains(2L) && !got.contains(1L), s"probe stays cid-0-only: $got")
  }

  test("cosine near-dup: co-directional pair surfaces, orthogonal pair absent") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.01f, 0.0f, 0.0f)), // near-dup of 0 (same direction)
      (2L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite direction
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)) // orthogonal
    ).toDF("vec_id", "embedding")
    val pairs = TextOps.cosineNearDupPairs(emb, planes = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((0L, 1L)), s"near-dup found: $pairs")
    assert(pairs((0L, 1L)) > 0.99)
    assert(!pairs.contains((0L, 2L)), "opposite direction never passes")
    assert(!pairs.keySet.exists(p => p._2 == 3L && pairs.get(p).exists(_ >= 0.9)))
  }

  test("langId predicts via marker voting with 'und' fallback") {
    val out = TextOps.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(0L) == "en")
    assert(out(4L) == "fr")
  }

  test("token stats and quality score arithmetic") {
    val ts = TextOps.tokenStats(docs.filter($"doc_id" === 0)).collect().head
    assert(ts.getLong(1) == 9) // tokens
    assert(ts.getLong(2) == 43) // chars
    val qs = TextOps.qualityScore(docs.filter($"doc_id" === 0)).collect().head
    assert(qs.getLong(1) == 9)
    assert(math.abs(qs.getDouble(2) - 2.0 / 9) < 1e-6) // 'the' twice
  }

  test("multimodal features carry byte metadata and stable digest") {
    val mm = TextOps.multimodalFeatures(docs.filter($"doc_id" === 0)).collect().head
    assert(mm.getString(1) == "application/octet-stream")
    assert(mm.getLong(2) == 43)
    assert(mm.getString(3) ==
      graft.core.UrlNormalizer.sha256Hex("the quick brown fox jumps over the lazy dog"))
  }
}
