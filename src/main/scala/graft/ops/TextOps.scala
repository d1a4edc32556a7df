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
      expr(
        """transform(split(text, ' '), (tok, i) ->
             named_struct(
               'kind', CASE WHEN i % 3 = 2 THEN 'media' ELSE 'text' END,
               'text', CASE WHEN i % 3 = 2 THEN '' ELSE tok END,
               'media_ref', CASE WHEN i % 3 = 2
                 THEN concat('asset://', md5(tok)) ELSE '' END,
               'offset', i))""").as("spans"))

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

  /** Word k-shingles of the document text. */
  def shingles(text: Column, k: Int): Column =
    expr(s"""transform(
        sequence(0, greatest(size(split(text, ' ')) - $k, 0)),
        i -> concat_ws(' ', slice(split(text, ' '), i + 1, $k)))""")

  /** MinHash signatures: K salted portable hashes, min over shingles.
    * (shingle → minhash; bands over the signature give the LSH buckets.)
    */
  def minhashSignatures(docs: DataFrame, k: Int = 8, shingleLen: Int = 3): DataFrame =
    docs.select(col("doc_id"), explode(shingles(col("text"), shingleLen)).as("sh"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ${k - 1}), j -> named_struct('k', j, " +
          s"'h', cast(conv(substring(md5(concat(sh, '#', j)), 1, 15), 16, 10) as bigint)))"))
        .as("kh"))
      .groupBy(col("doc_id"), col("kh.k").as("k"))
      .agg(min(col("kh.h")).as("minhash"))

  /** LSH near-duplicate candidate pairs: band the signature, bucket-join,
    * emit distinct (a < b) pairs sharing at least one band. The join key
    * (band, band_hash) is what shards at scale — no all-pairs comparison.
    */
  def minhashLshPairs(docs: DataFrame, k: Int = 8, bands: Int = 4,
      shingleLen: Int = 3): DataFrame = {
    val rows = k / bands
    val sig = minhashSignatures(docs, k, shingleLen)
    val banded = sig.withColumn("band", (col("k") / rows).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(min(col("minhash")).as("h1"), max(col("minhash")).as("h2"))
      .select(col("doc_id"), col("band"),
        md5(concat_ws("|", col("h1"), col("h2"))).as("band_hash"))
    val a = banded.select(col("band"), col("band_hash"), col("doc_id").as("a"))
    val b = banded.select(col("band"), col("band_hash"), col("doc_id").as("b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** 16-bit SimHash over token hashes: bit j of the fingerprint is the
    * sign of Σ_tokens (bit j of hash(token) ? +1 : -1).
    */
  def simhash16(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), portableHash(col("tok")).as("h"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, 15), j -> named_struct('j', j, " +
          "'v', CASE WHEN (shiftright(h, j) % 2) = 1 THEN 1 ELSE -1 END))"))
        .as("bj"))
      .groupBy(col("doc_id"), col("bj.j").as("j"))
      .agg(sum(col("bj.v")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(cast(1 as bigint), j)"))
        .otherwise(lit(0L))).as("simhash"))

  /** n-gram Jaccard near-dup pairs within (lang, source) blocks:
    * |A∩B| / |A∪B| over distinct word n-grams. Blocking keys bound the
    * pair count; the distinct-shingle explode + co-group is the
    * shuffle-partitionable form.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.1): DataFrame = {
    val sh = docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(shingles(col("text"), n)).as("sh")).distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val joined = sh.as("x").join(sh.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
          col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
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

  /** Cosine similarity of two double arrays (codegen'd higher-order fns). */
  private def cosineExpr(l: String, r: String): Column = expr(
    s"""aggregate(zip_with($l, $r, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)
        / (sqrt(aggregate($l, cast(0.0 as double), (acc, v) -> acc + v * v))
         * sqrt(aggregate($r, cast(0.0 as double), (acc, v) -> acc + v * v)))""")

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
    */
  def lshBuckets(embeddings: DataFrame, planes: Int = 8): DataFrame =
    embeddings
      .select(col("vec_id"), posexplode(col("embedding")))
      // quantize components so the per-plane dot product is an exact
      // integer sum — bucket bits stay identical under any shuffle order
      .select(col("vec_id"), col("pos").as("d"),
        round(col("col").cast("double") * 1048576).cast("bigint").as("xq"))
      .withColumn("p", explode(expr(s"sequence(0, ${planes - 1})")))
      .withColumn("w", when(
        portableHash(concat(col("p"), lit(":"), col("d"))) % 2 === 0, lit(1L))
        .otherwise(lit(-1L)))
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(col("xq") * col("w")).as("dot"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("dot") > 0, expr("shiftleft(cast(1 as bigint), p)"))
        .otherwise(lit(0L))).as("bucket"))

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
