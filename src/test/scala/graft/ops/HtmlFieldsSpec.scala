package graft.ops

import graft.SparkTestBase
import graft.core.UrlNormalizer
import graft.corpus.{Corpus, CorpusParams}
import org.scalatest.funsuite.AnyFunSuite

/** Structurally independent oracle for HtmlOps: a sequential tag SCANNER
  * (tokenizer + depth-tracked element walk), not regex — implementing the
  * reference extractor's goquery semantics directly
  * (fetcher/extractor.go:77-200): exists-gated attribute pulls, trimmed
  * precedence chains, strip-selector subtree removal before text
  * concatenation. Agreement between this and the production regex
  * pipeline on the whole corpus proves the regexes implement the
  * selector semantics under the generated-HTML contract.
  */
object HtmlScanOracle {
  sealed trait Tok
  final case class Text(s: String) extends Tok
  final case class Open(name: String, attrs: Map[String, String]) extends Tok
  final case class Close(name: String) extends Tok

  private val attrRe = """([a-zA-Z:_-]+)\s*=\s*"([^"]*)"""".r

  def tokenize(html: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var p = 0
    while (p < html.length) {
      val lt = html.indexOf('<', p)
      if (lt < 0) { out += Text(html.substring(p)); p = html.length }
      else {
        if (lt > p) out += Text(html.substring(p, lt))
        val gt = html.indexOf('>', lt)
        val inner = html.substring(lt + 1, gt)
        if (inner.startsWith("/")) out += Close(inner.drop(1).trim.toLowerCase)
        else if (inner.startsWith("!")) () // doctype/comment: no text value
        else {
          val name = inner.takeWhile(c => !c.isWhitespace && c != '/')
          out += Open(name.toLowerCase,
            attrRe.findAllMatchIn(inner.drop(name.length))
              .map(m => m.group(1).toLowerCase -> m.group(2)).toMap)
        }
        p = gt + 1
      }
    }
    out.result()
  }

  private def goTrim(s: String): String = s.replaceAll("^\\s+|\\s+$", "")

  /** First element named `name` filtered on attrs; returns its attr map. */
  private def firstAttrs(toks: Vector[Tok], name: String,
      pred: Map[String, String] => Boolean): Option[Map[String, String]] =
    toks.collectFirst { case Open(n, a) if n == name && pred(a) => a }

  /** goquery .Attr: ("", exists) of the FIRST matched element. */
  private def attr(toks: Vector[Tok], name: String, filterAttr: String,
      filterVal: String, want: String): Option[String] =
    firstAttrs(toks, name, _.get(filterAttr).contains(filterVal))
      .map(_.getOrElse(want, ""))

  /** Concatenated text of the first element named `name`, with
    * strip-selector subtrees removed (extractor.go:113-131). Depth
    * tracks `name` itself so an unmatched close never truncates early;
    * strip tags skip to their own close.
    */
  private val stripTags = Set("script", "style", "nav", "header", "footer")

  private def elementText(toks: Vector[Tok], name: String): Option[String] = {
    val start = toks.indexWhere { case Open(n, _) => n == name; case _ => false }
    if (start < 0) return None
    val sb = new StringBuilder
    var depth = 1
    var skip: Option[String] = None
    var i = start + 1
    while (i < toks.length && depth > 0) {
      toks(i) match {
        case Open(n, _) =>
          if (skip.isEmpty && stripTags(n)) skip = Some(n)
          else if (n == name) depth += 1
        case Close(n) =>
          if (skip.contains(n)) skip = None
          else if (n == name) depth -= 1
        case Text(s) => if (skip.isEmpty) sb ++= s
      }
      i += 1
    }
    Some(sb.toString)
  }

  final case class Fields(title: String, description: String, author: String,
      body: String, contentHash: String, wordCount: Long, ogType: String,
      ogTitle: String, ogDescription: String, ogImage: String,
      canonicalUrl: String, metaKeywords: String, publishedDate: String)

  def extract(html: String): Fields = {
    val toks = tokenize(html)
    def metaName(n: String): Option[String] = attr(toks, "meta", "name", n, "content")
    def metaProp(p: String): Option[String] = attr(toks, "meta", "property", p, "content")

    // extractPageTitle: <title> text trimmed, non-empty; else og:title
    val titleTxt = elementText(toks, "title").map(goTrim).getOrElse("")
    val title =
      if (titleTxt.nonEmpty) titleTxt
      else metaProp("og:title").map(goTrim).getOrElse("")
    // extractMetaDescription: exists-gated, then og:description
    val description = metaName("description").map(goTrim)
      .orElse(metaProp("og:description").map(goTrim)).getOrElse("")
    val author = metaName("author").map(goTrim).getOrElse("")
    // extractBodyText: article preferred (element EXISTS check), body else
    val body = goTrim(elementText(toks, "article")
      .orElse(elementText(toks, "body")).getOrElse(""))
    val wordCount =
      if (body.isEmpty) 0L else body.split("\\s+").count(_.nonEmpty).toLong
    // extractPublishedDate: non-empty-gated precedence over 4 patterns
    val published = Seq(
      metaProp("article:published_time"), metaName("datePublished"),
      metaName("pubdate"),
      firstAttrs(toks, "time", _.contains("datetime")).map(_("datetime")))
      .flatten.map(goTrim).find(_.nonEmpty).getOrElse("")
    Fields(
      title = title, description = description, author = author, body = body,
      contentHash = UrlNormalizer.sha256Hex(body), wordCount = wordCount,
      ogType = metaProp("og:type").map(goTrim).getOrElse(""),
      ogTitle = metaProp("og:title").map(goTrim).getOrElse(""),
      ogDescription = metaProp("og:description").map(goTrim).getOrElse(""),
      ogImage = metaProp("og:image").map(goTrim).getOrElse(""),
      canonicalUrl = attr(toks, "link", "rel", "canonical", "href")
        .map(goTrim).getOrElse(""),
      metaKeywords = metaName("keywords").map(goTrim).getOrElse(""),
      publishedDate = published)
  }
}

class HtmlFieldsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def sparkExtract(htmls: Seq[(Long, String)]): Map[Long, HtmlScanOracle.Fields] =
    HtmlOps.extractFields(htmls.toDF("id", "html"), "html", "id")
      .collect().map { r =>
      r.getLong(0) -> HtmlScanOracle.Fields(
        r.getString(1), r.getString(2), r.getString(3), r.getString(4),
        r.getString(5), r.getLong(6), r.getString(7), r.getString(8),
        r.getString(9), r.getString(10), r.getString(11), r.getString(12),
        r.getString(13))
    }.toMap

  test("reference precedence vectors (extractor_test.go:16-100 behavior)") {
    // title present + article preferred + nav/footer stripped
    val full = """<html>
<head>
  <title>Breaking News: Test Article</title>
  <meta name="description" content="A test article description.">
  <meta name="author" content="Jane Doe">
</head>
<body>
  <nav>Navigation links</nav>
  <article>
    <h1>Breaking News: Test Article</h1>
    <p>This is the article body text for testing purposes.</p>
  </article>
  <footer>Footer content</footer>
</body>
</html>"""
    // no <title>: og fallback for title AND description
    val ogFallback = """<html>
<head>
  <meta property="og:title" content="OG Title Fallback">
  <meta property="og:description" content="OG description fallback.">
</head>
<body>
  <p>Some body content here.</p>
</body>
</html>"""
    // script/style stripped from body fallback
    val scripty = """<html>
<head><title>Script Test</title></head>
<body>
  <p>Visible text content.</p>
  <script>var x = 1;</script>
  <style>.hidden { display: none; }</style>
  <p>More visible text.</p>
</body>
</html>"""
    // rich metadata: every field populated
    val rich = """<html>
<head>
  <title>Rich Article Title</title>
  <meta name="description" content="A rich article description.">
  <meta name="author" content="John Smith">
  <meta name="keywords" content="news, breaking, test">
  <meta property="og:type" content="article">
  <meta property="og:title" content="OG Rich Title">
  <meta property="og:description" content="OG rich description.">
  <meta property="og:image" content="https://example.com/image.jpg">
  <meta property="article:published_time" content="2025-06-15T10:30:00Z">
  <link rel="canonical" href="https://example.com/canonical-article">
</head>
<body>
  <article>
    <p>Nine words of body text for the count check.</p>
  </article>
</body>
</html>"""
    val out = sparkExtract(Seq(1L -> full, 2L -> ogFallback, 3L -> scripty, 4L -> rich))

    assert(out(1L).title == "Breaking News: Test Article")
    assert(out(1L).description == "A test article description.")
    assert(out(1L).author == "Jane Doe")
    assert(out(1L).body.contains("article body text for testing"))
    assert(!out(1L).body.contains("Navigation links"))
    assert(!out(1L).body.contains("Footer content"))

    assert(out(2L).title == "OG Title Fallback")
    assert(out(2L).description == "OG description fallback.")
    assert(out(2L).body == "Some body content here.")

    assert(out(3L).body.contains("Visible text content."))
    assert(out(3L).body.contains("More visible text."))
    assert(!out(3L).body.contains("var x"))
    assert(!out(3L).body.contains("display: none"))

    assert(out(4L).ogType == "article" && out(4L).ogTitle == "OG Rich Title")
    assert(out(4L).ogDescription == "OG rich description.")
    assert(out(4L).ogImage == "https://example.com/image.jpg")
    assert(out(4L).canonicalUrl == "https://example.com/canonical-article")
    assert(out(4L).metaKeywords == "news, breaking, test")
    assert(out(4L).publishedDate == "2025-06-15T10:30:00Z")
    assert(out(4L).wordCount == 9L)
    assert(out(4L).contentHash ==
      UrlNormalizer.sha256Hex("Nine words of body text for the count check."))

    // published-date precedence: each lower pattern only fires when the
    // higher ones are absent (extractor.go:169-185)
    def page(metas: String, body: String = "") =
      s"<html>\n<head>$metas</head>\n<body>$body</body>\n</html>"
    val pt = """<meta property="article:published_time" content="2025-01-01">"""
    val dp = """<meta name="datePublished" content="2025-02-02">"""
    val pd = """<meta name="pubdate" content="2025-03-03">"""
    val tm = """<time datetime="2025-04-04">when</time>"""
    val prec = sparkExtract(Seq(
      1L -> page(pt + dp + pd, tm), 2L -> page(dp + pd, tm),
      3L -> page(pd, tm), 4L -> page("", tm), 5L -> page("")))
    assert(prec(1L).publishedDate == "2025-01-01")
    assert(prec(2L).publishedDate == "2025-02-02")
    assert(prec(3L).publishedDate == "2025-03-03")
    assert(prec(4L).publishedDate == "2025-04-04")
    assert(prec(5L).publishedDate == "")
  }

  test("whole-corpus parity: regex pipeline == tag-scanner oracle") {
    val p = CorpusParams(numHosts = 6, pagesPerHost = 12, skewHosts = 1,
      skewFactor = 3, outdegree = 4)
    val pages = for {
      i <- 0 until p.numHosts
      j <- 0 until p.pagesOf(i)
    } yield (p.hostOffsets(i) + j, Corpus.pageHtml(p, i, j))
    val got = sparkExtract(pages)
    var checkedVariants = Set.empty[String]
    pages.foreach { case (id, html) =>
      val want = HtmlScanOracle.extract(html)
      assert(got(id) == want, s"page $id mismatch\nhtml:\n$html")
      if (want.title.startsWith("OG ")) checkedVariants += "og-title-fallback"
      if (!html.contains("<article>")) checkedVariants += "body-fallback"
      if (want.publishedDate.isEmpty) checkedVariants += "no-date"
      if (html.contains("<time ")) checkedVariants += "time-elem"
      if (want.body.isEmpty) checkedVariants += "empty-body"
    }
    // the corpus must actually exercise the precedence branches
    assert(Set("og-title-fallback", "body-fallback", "no-date", "time-elem")
      .subsetOf(checkedVariants), s"variants seen: $checkedVariants")
  }
}
