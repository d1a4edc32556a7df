package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-side HTML field extraction — the set-oriented form of the
  * reference's goquery content extractor
  * (crawler/internal/fetcher/extractor.go:42-74 precedence rules,
  * 77-131 title/description/author/body, 140-200 OG/canonical/keywords/
  * published-date patterns). One codegen'd projection per row; no UDF,
  * no shuffle — at 100 TB this is a map-only stage.
  *
  * Semantics contract (HtmlFieldsSpec pins them against a structurally
  * independent tag-scanner oracle and the reference's own test vectors,
  * extractor_test.go:16-100):
  *   - title: first <title> text, trimmed; empty/absent → og:title.
  *   - description: meta[name=description] → og:description → "".
  *   - author: meta[name=author] → "".
  *   - body: first <article> inner text if present, else <body>, with
  *     script/style/nav/header/footer subtrees removed, tags stripped,
  *     then trimmed (reference nonContentSelectors, extractor.go:113).
  *   - content_hash = sha256 hex of body; word_count = whitespace fields.
  *   - og_type/og_title/og_description/og_image, canonical link href,
  *     meta keywords: direct attribute pulls, "" when absent.
  *   - published_date precedence: article:published_time →
  *     datePublished → pubdate → <time datetime> (extractor.go:169-185).
  *
  * Input contract (what the deterministic corpus generator guarantees,
  * and what a lenient-DOM reimplementation would relax): double-quoted
  * attributes in source order (property/name before content), no HTML
  * entities in values, non-empty values when a tag is present, at most
  * one <article>, and no nested strip-selector elements of the same tag.
  * Under that contract these regex pulls are EXACTLY the goquery
  * selector semantics — the spec proves it on the whole corpus.
  */
object HtmlOps {

  private def rtrim2(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** Trimmed attribute pull that is NULL when the tag is absent (regex
    * misses → "" → null), so precedence chains are plain coalesce.
    */
  private def metaName(h: Column, n: String): Column = {
    val v = rtrim2(regexp_extract(h, s"""<meta name="$n" content="([^"]*)"""", 1))
    when(v =!= "", v)
  }

  private def metaProp(h: Column, p: String): Column = {
    val v = rtrim2(regexp_extract(h, s"""<meta property="$p" content="([^"]*)"""", 1))
    when(v =!= "", v)
  }

  /** All extracted fields as one per-row generator projection.
    * `inline(array(struct))` makes the 13 output columns the output of a
    * single Generate evaluation — CollapseProject cannot re-inline the
    * extraction pipeline once per referencing column (the round-2
    * multi-reference trap), and the body/strip pipeline itself is bound
    * ONCE via a lambda so body, content_hash and word_count share one
    * evaluation.
    */
  def extractFields(docs: DataFrame, htmlCol: String, keyCols: String*): DataFrame = {
    val h = col(htmlCol)

    val titleRaw = rtrim2(regexp_extract(h, "(?s)<title>(.*?)</title>", 1))
    val title = coalesce(when(titleRaw =!= "", titleRaw),
      metaProp(h, "og:title"), lit(""))
    val description = coalesce(metaName(h, "description"),
      metaProp(h, "og:description"), lit(""))
    val author = coalesce(metaName(h, "author"), lit(""))
    val ogType = coalesce(metaProp(h, "og:type"), lit(""))
    val ogTitle = coalesce(metaProp(h, "og:title"), lit(""))
    val ogDescription = coalesce(metaProp(h, "og:description"), lit(""))
    val ogImage = coalesce(metaProp(h, "og:image"), lit(""))
    val canonRaw = rtrim2(regexp_extract(h, """<link rel="canonical" href="([^"]*)"""", 1))
    val canonical = coalesce(when(canonRaw =!= "", canonRaw), lit(""))
    val keywords = coalesce(metaName(h, "keywords"), lit(""))
    val timeRaw = rtrim2(regexp_extract(h, """<time datetime="([^"]*)"""", 1))
    val published = coalesce(metaProp(h, "article:published_time"),
      metaName(h, "datePublished"), metaName(h, "pubdate"),
      when(timeRaw =!= "", timeRaw), lit(""))

    val articleInner = regexp_extract(h, "(?s)<article>(.*?)</article>", 1)
    val bodyInner = regexp_extract(h, "(?s)<body>(.*?)</body>", 1)
    val chosen = when(articleInner =!= "", articleInner).otherwise(bodyInner)
    val stripped = Seq("script", "style", "nav", "header", "footer")
      .foldLeft(chosen)((c, t) => regexp_replace(c, s"(?s)<$t[^>]*>.*?</$t>", ""))
    val btext = rtrim2(regexp_replace(stripped, "<[^>]*>", ""))

    val full = transform(array(btext), b => struct(
      title.as("title"),
      description.as("description"),
      author.as("author"),
      b.as("body"),
      sha2(b, 256).as("content_hash"),
      when(b === "", 0L)
        .otherwise(size(split(b, "\\s+")).cast("long")).as("word_count"),
      ogType.as("og_type"),
      ogTitle.as("og_title"),
      ogDescription.as("og_description"),
      ogImage.as("og_image"),
      canonical.as("canonical_url"),
      keywords.as("meta_keywords"),
      published.as("published_date")))(0)

    docs.select(keyCols.map(col) :+ inline(array(full)): _*)
  }
}
