package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data pipeline operators over a `documents(doc_id,
  * text, lang, source, n_chars)` table and an `embeddings(vec_id,
  * embedding: array<float>, label)` table.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (no Scala UDFs in these hot paths): higher-order array functions for
  * shingling/minhash/simhash/cosine, hash-partitionable group-bys for the
  * dedup joins. Cross-engine determinism (the DuckDB oracle) comes from a
  * portable 60-bit hash: `conv(substr(md5(x),1,15),16,10)` — identical in
  * DuckDB as `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
  */
object TextOps {

  /** Portable 60-bit hash of a string column (same value in DuckDB). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  def tokens(text: Column): Column = split(text, " ")

  // ---------------------------------------------------------------- spans

  /** Re-express a document as the graft interleaved span shape
    * (doc_id, spans: array<struct<kind,text,media_ref,offset>>): every
    * third token becomes a media span referencing a derived asset — a
    * deterministic stand-in for extracted inline media
    * (fetcher/extractor.go:67,116-130).
    */
  def spanize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.TextExpressions.spanize(col("text")).as("spans"))

  /** Declarative HOF form of [[spanize]]'s span array, kept as the
    * executable cross-check oracle of the native SpanizeExpr.
    */
  private[graft] def spanizeSql: String =
    """transform(split(text, ' '), (tok, i) ->
         named_struct(
           'kind', CASE WHEN i % 3 = 2 THEN 'media' ELSE 'text' END,
           'text', CASE WHEN i % 3 = 2 THEN '' ELSE tok END,
           'media_ref', CASE WHEN i % 3 = 2
             THEN concat('asset://', md5(tok)) ELSE '' END,
           'offset', i))"""

  /** Ordered flattening of spans (posexplode keeps the order column). */
  def flattenSpans(spanned: DataFrame): DataFrame =
    spanned.select(col("doc_id"), posexplode(col("spans")))
      .select(col("doc_id"), col("col.offset").as("offset"),
        col("col.kind").as("kind"), col("col.text").as("text"),
        col("col.media_ref").as("media_ref"))

  // ---------------------------------------------------------------- dedup

  /** Exact dedup: canonical doc per identical text = min doc_id
    * (hash-partitioned group-by; the 100 TB shape is a shuffle on the
    * text hash, never a driver collect).
    */
  def dedupExact(docs: DataFrame): DataFrame = {
    // group/join on a 256-bit digest of the text, never the text itself:
    // at 100 TB the shuffle ships 32-byte keys instead of multi-KB bodies
    // (collision probability of sha-256 is below the cluster's bit-flip
    // rate, so equality-on-hash is equality).
    val keyed = docs.select(col("doc_id"), sha2(col("text"), 256).as("tkey"))
    val canon = keyed.groupBy(col("tkey"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("dup_count"))
    keyed.join(canon, "tkey")
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"), col("dup_count"))
  }

  /** Word k-shingles of the document text (native ShinglesExpr; the
    * declarative HOF it replaces — asserted equal in TextOpsSpec — is
    * [[shinglesSql]]).
    */
  def shingles(text: Column, k: Int): Column =
    graft.functions.TextExpressions.word_shingles(text, k)

  /** Declarative HOF form of [[shingles]], kept as the executable
    * cross-check oracle of the native expression.
    */
  private[graft] def shinglesSql(k: Int): String =
    s"""transform(
        sequence(0, greatest(size(split(text, ' ')) - $k, 0)),
        i -> concat_ws(' ', slice(split(text, ' '), i + 1, $k)))"""

  /** SQL-HOF "let": bind an expensive per-row expression ONCE under a
    * lambda variable. `transform(array(v), x -> body)[0]` is the only way
    * SQL higher-order functions can name an intermediate — without it the
    * optimizer may inline `v` into every use site (K× the work for a
    * K-reference body; measured 2-5× on the minhash family).
    */
  private def let1(bound: String, value: String, body: String): String =
    s"transform(array($value), $bound -> $body)[0]"

  /** Per-row MinHash signature array: element j = min over shingles of the
    * salted portable hash. A pure projection — ZERO shuffle (the
    * explode(shingles)×K + groupBy form shuffles |doc|×K rows; at 100 TB
    * that shuffle IS the job). Tokens and shingles are each bound once.
    */
  /** Declarative (pure-SQL) form of the signature — kept as the
    * cross-check oracle for the native expression (TextOpsSpec asserts
    * equality) and as documentation of the exact semantics.
    */
  def minhashSignatureSql(shingleLen: Int, k: Int): String =
    let1("toks", "split(text, ' ')",
      let1("shs",
        s"""transform(sequence(0, greatest(size(toks) - $shingleLen, 0)),
              i -> concat_ws(' ', slice(toks, i + 1, $shingleLen)))""",
        s"""transform(sequence(0, ${k - 1}), j ->
              array_min(transform(shs,
                s -> cast(conv(substring(md5(concat(s, '#', j)), 1, 15), 16, 10) as bigint))))"""))

  def minhashSignatureArray(shingleLen: Int, k: Int): Column =
    graft.functions.TextExpressions.minhash_signature(col("text"), shingleLen, k)

  /** MinHash signatures in the (doc_id, k, minhash) long shape — the
    * per-row array, posexploded (order column kept, still no shuffle).
    */
  def minhashSignatures(docs: DataFrame, k: Int = 8, shingleLen: Int = 3): DataFrame =
    docs.select(col("doc_id"),
        posexplode(minhashSignatureArray(shingleLen, k)))
      .select(col("doc_id"), col("pos").as("k"), col("col").as("minhash"))

  /** LSH near-duplicate candidate pairs: band the per-row signature,
    * group docs by (band, band_hash) bucket, emit all (a < b) pairs WITHIN
    * each bucket. ONE shuffle total — the bucket groupBy — which is what
    * shards at scale; no self-join (a self-join would evaluate the
    * signature pipeline twice, once per side) and no all-pairs comparison.
    * `maxBucket` (ON by default — the 100 TB guard) drops degenerate
    * buckets — e.g. the empty-document band — whose quadratic pair
    * blow-up would otherwise dominate: a bucket of m docs emits m²/2
    * pairs, and a single pathological band key (all-empty documents, a
    * boilerplate page repeated site-wide) can hold millions of docs.
    * The drop is an explicit parameter with defined semantics
    * ("candidates among buckets of ≤ maxBucket docs"), mirrored in the
    * oracle SQL — not a silent truncation. Pass Long.MaxValue to disable.
    */
  def minhashLshPairs(docs: DataFrame, k: Int = 8, bands: Int = 4,
      shingleLen: Int = 3, maxBucket: Long = 10000L): DataFrame = {
    val rows = k / bands
    // band b's key = md5(min | max) over its signature slice; `let1` binds
    // the signature column so it can never be re-inlined per band.
    val banded = docs
      .select(col("doc_id"), minhashSignatureArray(shingleLen, k).as("sigc"))
      .select(col("doc_id"), posexplode(expr(
        let1("sig", "sigc",
          s"""transform(sequence(0, ${bands - 1}), b ->
                md5(concat_ws('|',
                  array_min(slice(sig, b * $rows + 1, $rows)),
                  array_max(slice(sig, b * $rows + 1, $rows)))))"""))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))
    val buckets = banded
      .groupBy(col("band"), col("band_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val capped =
      if (maxBucket == Long.MaxValue) buckets
      else buckets.filter(size(col("ids")) <= maxBucket)
    capped.select(explode(expr(
        """flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids)),
               y -> named_struct('a', x, 'b', y))))""")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b")).distinct()
  }

  /** 16-bit SimHash over token hashes: bit j of the fingerprint is the
    * sign of Σ_tokens (bit j of hash(token) ? +1 : -1). Computed per-row
    * with nested higher-order functions — zero shuffle (the previous
    * explode(tokens)×16 + two groupBys shuffled 16×|tokens| rows).
    */
  def simhash16(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(
      let1("hs",
        """transform(split(text, ' '),
             t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))""",
        """aggregate(sequence(0, 15), cast(0 as bigint), (acc, j) ->
             acc + CASE WHEN
               aggregate(hs, cast(0 as bigint),
                 (a, h) -> a + CASE WHEN shiftright(h, j) % 2 = 1
                                THEN 1 ELSE -1 END) > 0
             THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END)"""))
      .as("simhash"))

  /** n-gram Jaccard near-dup pairs within (lang, source) blocks:
    * |A∩B| / |A∪B| over distinct word n-grams. Blocking keys bound the
    * pair count; the distinct-shingle explode + co-group is the
    * shuffle-partitionable form.
    *
    * `maxDocFreq` is the STOP-SHINGLE cut — the 100 TB guard: a shingle
    * shared by m documents emits m²/2 pair rows, so one ubiquitous
    * phrase ("click here to read") turns the group-by into a quadratic
    * hot spot. Shingles whose document frequency (within the block)
    * exceeds the cut are dropped from BOTH the intersection counting and
    * the per-doc set sizes — the semantics become "Jaccard over
    * informative shingles", identical on the Spark and oracle sides, an
    * explicit parameter rather than a silent truncation. Hot shingles
    * carry no near-dup signal (everyone shares them), so recall on real
    * near-dups is essentially untouched while the worst-case cost drops
    * from O(m²) to O(maxDocFreq²) per shingle.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.1,
      maxDocFreq: Long = 10000L): DataFrame = {
    val sh = docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(shingles(col("text"), n)).as("sh"))
    // pairs per shared shingle WITHOUT a self-join (which would evaluate
    // the shingle pipeline twice and shuffle both sides): group each
    // (lang, source, shingle) into its sorted DISTINCT doc list and emit
    // the in-group (a < b) pairs — |shared shingles| rows per pair,
    // counted. ONE shuffle builds the groups — collect_set dedups
    // (doc_id, shingle) repeats inside the aggregation itself, replacing
    // the former separate .distinct() pass (which shuffled the whole
    // shingle explode a second time on a 4-column key). Sizes re-derive
    // from the (small) grouped lists instead of a second explode pass.
    val grouped = sh
      .groupBy(col("lang"), col("source"), col("sh"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= maxDocFreq) // stop-shingle cut
      // materialize ONCE: three consumers read the grouped set (the pair
      // emitter + the sizes side of both joins), and their slightly
      // different downstream filters defeat ReuseExchange — without this
      // the whole tokenize→shingle→distinct→collect_list pipeline (the
      // expensive 90%) executes three times. Verified in the physical
      // plan: 3 FileScans, 0 ReusedExchange. LAZY: the checkpoint RDD is
      // shared by all three subtrees, so the first action computes it
      // once — eager would run the heavy job at plan-construction time
      // (e.g. for a bare .explain).
      .localCheckpoint(eager = false)
    val sizes = grouped.select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      // consumed by BOTH per-side joins below; their column renames defeat
      // ReuseExchange, so without this the explode+aggregate pass over the
      // grouped set runs twice (observed: duplicated subtrees (10-16) and
      // (19-25) in the r06 before-plan). Lazy, like `grouped` above.
      .localCheckpoint(eager = false)
    val joined = grouped
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids)),
               y -> named_struct('a', x, 'b', y))))""")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("inter"))
    joined
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------------------ similarity

  /** IVF-style ANN top-k (the inverted-file scale path beside the LSH
    * one): vectors are assigned to their nearest CENTROID's inverted
    * list; a query ranks centroids, probes the best `nprobe` lists, and
    * exact-reranks only those candidates — corpus scanned ∝ nprobe/nlist.
    *
    * The codebook is the first `nlist` vectors by vec_id — a
    * DETERMINISTIC stand-in for a k-means training step (which is an
    * offline batch job a real deployment runs separately); everything
    * the INDEX contributes — the inverted lists, the centroid ranking,
    * the bounded probe, the in-list rerank — is real and oracle-checked.
    * Assignment is a broadcast of the (small) codebook against the
    * corpus; candidates flow through an equi-join on list id, so at
    * 100 TB the probe is a partition-pruned join, never a scan.
    */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val v = embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val cents = v.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    // inverted lists: per-row argmax-cosine centroid over the BROADCAST
    // codebook (one array of {cid, centroid} structs, cid-ascending) —
    // the assignment is a pure projection after a 1-row broadcast join,
    // never an Exchange of the corpus (the previous form windowed
    // |corpus|×nlist rows through a corpus-sized shuffle). Ranking
    // cosines are ROUNDED (6 dp) before the argmax, as in annLshTopK:
    // a sub-ulp cross-engine float difference must never flip a list
    // assignment away from the oracle's. Strict > over the cid-ascending
    // scan resolves ties to the LOWEST cid — identical to the oracle's
    // (ccos DESC, cid ASC) ranking; that covers the zero-norm case too,
    // since cosineSql yields DuckDB's exact -1.0 convention there (all
    // centroids tie at -1 > the -2 seed ⇒ lowest cid, never a vanished
    // cid -1 row).
    val cbDf = cents.groupBy()
      .agg(expr("sort_array(collect_list(struct(cid, cv)))").as("cb"))
    // native argmax over the codebook (IvfAssignExpr): the same rounded
    // cosines, seed and strict-> tie-break as the aggregate-HOF form it
    // replaces — one codegen'd loop instead of |codebook| interpreted
    // lambda frames (each with 3 inner HOF passes) per corpus row
    val lists = v.crossJoin(broadcast(cbDf))
      .select(col("vec_id"), col("v"),
        graft.functions.TextExpressions.ivf_assign(col("v"), col("cb"))
          .as("cid"))
    // each query probes its nprobe best centroids
    val probeW = w.partitionBy(col("qid")).orderBy(desc("qcos"), asc("cid"))
    val probes = v.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("cid"),
        round(cosineExpr("qv", "cv"), 6).as("qcos"))
      .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    // candidates = probed lists only; exact rerank inside them
    val rankW = w.partitionBy(col("qid")).orderBy(desc("cos"), asc("vec_id"))
    lists.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), round(cosineExpr("qv", "v"), 6).as("cos"))
      .withColumn("rn", row_number().over(rankW)).filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("vec_id"), col("cos"))
  }

  /** Embedding-cosine NEAR-DUP pairs — the dedup-family member over
    * vectors: candidates come from shared random-hyperplane LSH buckets
    * (direction-correlated, so high-cosine pairs co-bucket with high
    * probability), then the exact cosine filters at `threshold`. Defined
    * semantics = "pairs that share a bucket AND pass the threshold" —
    * the oracle mirrors the same buckets, so recall<1 vs all-pairs is
    * part of the contract, not an approximation error. One shuffle
    * builds the buckets (in-bucket pair emission, no self-join of the
    * bucket pipeline); the two vector joins are by key. `maxBucket`
    * caps a degenerate bucket's O(m²) pair blow-up, as in
    * [[minhashLshPairs]].
    */
  def cosineNearDupPairs(embeddings: DataFrame, planes: Int = 4,
      threshold: Double = 0.25, maxBucket: Long = 10000L): DataFrame = {
    val cand = lshBuckets(embeddings, planes)
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids)),
               y -> named_struct('a', x, 'b', y))))""")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val v = embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    cand
      .join(v.select(col("vec_id").as("a"), col("v").as("va")), "a")
      .join(v.select(col("vec_id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"), round(cosineExpr("va", "vb"), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Cosine similarity of two double arrays — declarative HOF form,
    * kept as the executable documentation / cross-check oracle of the
    * native CosineSimExpr kernel (TextOpsSpec asserts equality; the
    * DuckDB oracle mirrors these exact semantics).
    */
  private[graft] def cosineSql(l: String, r: String): String =
    // try_divide + coalesce(-1): a zero-norm side must not throw under
    // ANSI mode (plain `/` raises DIVIDE_BY_ZERO in Spark 4) and must
    // yield EXACTLY what DuckDB's list_cosine_similarity yields for a
    // zero vector (-1.0, measured) so every oracle mirror stays
    // value-identical — including the IVF assignment, where all-(-1)
    // ties resolve to the lowest cid on both engines.
    s"""coalesce(try_divide(
        aggregate(zip_with($l, $r, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v),
        sqrt(aggregate($l, cast(0.0 as double), (acc, v) -> acc + v * v))
         * sqrt(aggregate($r, cast(0.0 as double), (acc, v) -> acc + v * v))),
        cast(-1.0 as double))"""

  /** Native (whole-stage-codegen) cosine with the HOF form's -1.0
    * conventions: the kernel yields -1.0 for zero-norm / ragged / null
    * elements; a NULL input array (→ NULL through the whole HOF
    * pipeline's try_divide) falls to the same -1.0 via the coalesce —
    * exactly the declarative [[cosineSql]]. The HOF form interpreted
    * 3 boxed lambda passes per pair (zip_with + two aggregates, ~dim
    * allocations each); this is one arithmetic loop per pair.
    */
  private def cosineExpr(l: String, r: String): Column =
    coalesce(graft.functions.TextExpressions.cosine_sim(col(l), col(r)),
      lit(-1.0))

  /** Brute-force cosine top-k neighbours for a set of query vectors —
    * the exactness baseline. Queries are broadcast against the corpus
    * (corpus never collected); ordering ties broken by vec_id.
    */
  def cosineTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val emb = embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosineExpr("qv", "v"), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("vec_id"), col("cos"))
  }

  /** Random-hyperplane LSH bucket per vector (the ANN scale path: bucket
    * co-location turns top-k into per-bucket joins). Plane p component d
    * is ±1 from the portable hash of "p:d" — deterministic everywhere.
    * Components are quantized so the per-plane dot product is an exact
    * integer sum — bucket bits stay identical under any evaluation order,
    * and the whole bucket is ONE per-row nested-HOF projection (the
    * posexplode×planes + double-groupBy form shuffled dim×planes rows
    * per vector; this shuffles nothing).
    */
  /** First row's dimensionality (one LIMIT-1 job); assumes fixed-dim
    * vectors, the standard embedding-table contract.
    */
  private def headDim(embeddings: DataFrame): Option[Int] =
    embeddings.select(size(col("embedding")).as("d")).filter(col("d") > 0)
      .take(1).headOption.map(_.getInt(0))

  /** Fixed-dimension contract made explicit: a non-empty vector whose
    * dimensionality differs from the sampled `dim` raises at execution —
    * zip_with would silently null-pad it and flip bucket bits otherwise
    * (a silent parity break vs the per-dim oracle). CASE WHEN guarantees
    * the error branch only evaluates on violating rows.
    */
  private def dimGuard(op: String, dim: Int): Column = expr(
    s"""CASE WHEN size(embedding) = $dim THEN true
        ELSE cast(raise_error(concat('graft.$op: ragged embedding: dim ',
          size(embedding), ' != sampled $dim at vec_id ', vec_id)) as boolean)
        END""")

  def lshBuckets(embeddings: DataFrame, planes: Int = 8): DataFrame = {
    val dim = headDim(embeddings).getOrElse(
      return embeddings.select(col("vec_id"), lit(0L).as("bucket")).limit(0))
    // ONE native per-row call (LshBucketsExpr) replaces the broadcast
    // sign-matrix crossJoin + nested zip_with/aggregate HOF pipeline:
    // identical signs (md5("p:d") parity), identical quantized integer
    // dots — but codegen'd arithmetic instead of planes×dim interpreted
    // boxed lambda steps per row, and one plan node fewer (no join).
    embeddings
      .filter(size(col("embedding")) > 0) // explode-form semantics kept
      .filter(dimGuard("lshBuckets", dim))
      .select(col("vec_id"),
        graft.functions.TextExpressions
          .lsh_buckets(col("embedding"), 1, planes, dim, tableSalt = false)
          .getItem(0).as("bucket"))
  }

  /** ANN top-k over the LSH buckets — the query path the buckets exist
    * for. `tables` independent random-hyperplane hashes (plane signs
    * salted by "t:p:d"); candidates = corpus vectors sharing the query's
    * bucket in ANY table; exact cosine rerank within the candidate set.
    *
    * Scale shape: the corpus side is only ever touched by a per-row
    * bucket projection + an equi-join on (table, bucket); queries are
    * broadcast. No all-pairs scan — recall is traded via (tables, planes),
    * and `Bench` reports recall@k against the exact baseline.
    */
  def annLshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      planes: Int = 8, tables: Int = 4): DataFrame = {
    val dim = headDim(embeddings).getOrElse(
      return embeddings.select(col("vec_id").as("qid"), lit(0).as("rn"),
        col("vec_id"), lit(0.0).as("cos")).limit(0))
    // native per-row bucket array (salted md5("t:p:d") signs), identical
    // to the former broadcast-matrix + nested-HOF pipeline — see
    // [[lshBuckets]] for the rationale
    val bucketArr = graft.functions.TextExpressions
      .lsh_buckets(col("embedding"), tables, planes, dim, tableSalt = true)
    val emb = embeddings.filter(size(col("embedding")) > 0)
      .filter(dimGuard("annLshTopK", dim))
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"),
        posexplode(bucketArr))
      .select(col("vec_id"), col("v"), col("pos").as("t"), col("col").as("bucket"))
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("t"), col("bucket"), col("vec_id").as("qid"), col("v").as("qv"))
    val cand = emb.join(broadcast(q), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("vec_id"), col("v"))
      .dropDuplicates("qid", "vec_id") // union over tables
    val scored = cand.select(col("qid"), col("vec_id"),
      round(cosineExpr("qv", "v"), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("vec_id"), col("cos"))
  }

  // ---------------------------------------------------------- text analysis

  /** Token/char counting (whitespace tokens + a BPE-ish subword estimate). */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_actual"),
      // BPE-ish: ~1 token per 4 chars, lower-bounded by word count
      greatest(size(tokens(col("text"))).cast("long"),
        ceil(length(col("text")) / 4)).as("n_subwords"))

  /** Quality scoring: stopword ratio, mean word length, alpha ratio. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val stop = "the,a,of,and,to,in,is,it,for,on"
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      expr(s"""round(size(filter(split(text, ' '),
          t -> array_contains(split('$stop', ','), t)))
        / cast(size(split(text, ' ')) as double), 6)""").as("stopword_ratio"),
      expr("""round(length(replace(text, ' ', ''))
        / cast(size(split(text, ' ')) as double), 6)""").as("mean_word_len"))
  }

  /** Language ID by marker-word voting (n-gram heuristic stand-in); falls
    * back to 'und' when no marker hits.
    */
  def langId(docs: DataFrame): DataFrame = {
    def hits(words: String): Column =
      expr(s"size(filter(split(text, ' '), t -> array_contains(split('$words', ','), t)))")
    docs.select(col("doc_id"), col("lang").as("lang_true"),
      hits("the,and,of,is,value,table,row").as("en_hits"),
      hits("le,la,et,de,est").as("fr_hits"),
      hits("el,los,es,y,que").as("es_hits"),
      hits("der,die,das,und,ist").as("de_hits"))
      .withColumn("lang_pred",
        when(greatest(col("en_hits"), col("fr_hits"), col("es_hits"), col("de_hits")) === 0, "und")
          .when(col("en_hits") >= greatest(col("fr_hits"), col("es_hits"), col("de_hits")), "en")
          .when(col("fr_hits") >= greatest(col("es_hits"), col("de_hits")), "fr")
          .when(col("es_hits") >= col("de_hits"), "es")
          .otherwise("de"))
      .select(col("doc_id"), col("lang_true"), col("lang_pred"))
  }

  /** Document fingerprint: sha256 over whitespace-normalized lowercase text. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      sha2(lower(concat_ws(" ", tokens(col("text")))), 256).as("fp"))

  // ------------------------------------------------------------- multimodal

  /** Multimodal plumbing: documents carried as opaque binary payloads with
    * typed metadata. The decode step is a clearly-marked deterministic
    * STUB (no image/audio libs in this container — SURVEY.md scope); the
    * schema, batching, and partition shape are the real thing.
    */
  def multimodalFeatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("media_type"))
      .select(col("doc_id"), col("media_type"),
        length(col("payload")).cast("long").as("n_bytes"),
        // STUB decode: real deployments swap sha256 for a decoder UDF
        sha2(col("payload"), 256).as("content_digest"))
}
