package graft.corpus

import graft.core._
import scala.util.hashing.MurmurHash3

/** Deterministic synthetic web corpus (FIXTURES.md §5). Seeded, splittable:
  * every page is a pure function of (params, hostIdx, pageIdx), so Spark can
  * generate any slice in parallel with bit-identical results.
  *
  * The corpus exercises every fetch-state-machine branch of the reference
  * (fetcher/worker_test.go:278-974): success, robots-blocked, 404, 429, 5xx,
  * 304, redirect with final-URL rewrite (including re-key collision), binary
  * URL, unsupported content type, extract failure, too-many-redirects (a
  * redirect ring), missing pages (fetch error → retry/backoff), duplicate
  * URL variants (tracking params, http://, default ports, uppercase hosts),
  * skip-links (mailto:/javascript:), cross-host links, and one heavily
  * skewed host.
  */
final case class CorpusParams(
    seed: Int = 42,
    numHosts: Int = 10,
    pagesPerHost: Int = 30,
    skewHosts: Int = 1, // first N hosts get skewFactor× the pages
    skewFactor: Int = 5,
    outdegree: Int = 6,
    robotsModulo: Int = 3 // host i: i%m==0 → robots 200; i%m==1 → robots 404
) {
  /** number of special pages appended to host 0 (redirect ring + movers). */
  val specialPages: Int = if (numHosts >= 2) 9 else 0

  def pagesOf(i: Int): Int = {
    val base = if (i < skewHosts) pagesPerHost * skewFactor else pagesPerHost
    if (i == 0) base + specialPages else base
  }

  lazy val hostOffsets: Array[Long] = {
    val off = new Array[Long](numHosts + 1)
    var i = 0
    while (i < numHosts) { off(i + 1) = off(i) + pagesOf(i); i += 1 }
    off
  }

  def totalPages: Long = hostOffsets(numHosts)

  /** global page index → (hostIdx, pageIdx) */
  def locate(globalIdx: Long): (Int, Int) = {
    var lo = 0; var hi = numHosts
    while (lo + 1 < hi) {
      val mid = (lo + hi) / 2
      if (hostOffsets(mid) <= globalIdx) lo = mid else hi = mid
    }
    (lo, (globalIdx - hostOffsets(lo)).toInt)
  }
}

object Corpus {

  /** Splittable deterministic PRN: pure function of seed + tags. */
  def rnd(seed: Int, tags: Any*): Int = {
    val h = MurmurHash3.stringHash(tags.mkString("\u0000"), seed)
    h & 0x7fffffff
  }

  def host(i: Int): String = s"site$i.example.org"

  private val vocab = Array("northern", "harbor", "council", "market",
    "winter", "festival", "report", "community", "project", "river",
    "bridge", "library", "garden", "transit", "museum", "housing")

  def canonicalUrl(h: String, path: String): String = s"https://$h$path"

  /** Canonical path of page (i, j). Mix chosen to exercise the content-URL
    * heuristic (date paths + long slugs → +1 spider priority), robots
    * disallow prefixes, and binary-extension gates.
    */
  def pagePath(p: CorpusParams, i: Int, j: Int): String = {
    val base = if (i == 0) p.pagesOf(0) - p.specialPages else p.pagesOf(i)
    if (i == 0 && j >= base) {
      val s = j - base
      if (s < 7) s"/ring/$s"
      else if (s == 7) "/moved-1"
      else "/moved-external"
    } else if (j == 0) "/"
    else {
      val c = rnd(p.seed, "class", i, j) % 100
      if (c < 40) {
        val mm = f"${j % 12 + 1}%02d"
        val w1 = vocab(rnd(p.seed, "w1", i, j) % vocab.length)
        val w2 = vocab(rnd(p.seed, "w2", i, j) % vocab.length)
        s"/news/2024/$mm/$w1-$w2-update-story-$j"
      } else if (c < 55) s"/listings/item-$j"
      else if (c < 65) s"/info-$j"
      else if (c < 75) s"/private/doc-$j"
      else if (c < 83) s"/assets/file-$j.pdf"
      else s"/p/$j"
    }
  }

  def pageUrl(p: CorpusParams, i: Int, j: Int): String =
    canonicalUrl(host(i), pagePath(p, i, j))

  /** Build page (i, j). */
  def page(p: CorpusParams, i: Int, j: Int): PageRow = {
    val h = host(i)
    val path = pagePath(p, i, j)
    val url = canonicalUrl(h, path)
    val hash = UrlNormalizer.sha256Hex(url) // url is already canonical
    val base = if (i == 0) p.pagesOf(0) - p.specialPages else p.pagesOf(i)

    // ---- special pages on host 0 ----
    if (i == 0 && j >= base) {
      val s = j - base
      val (status, redirect) =
        if (s < 7) (301, pageUrl(p, 0, base + ((s + 1) % 7))) // 7-ring > 5 hops
        else if (s == 7) (301, pageUrl(p, 0, 1)) // final URL collides with existing page
        else (301, canonicalUrl(host(1), pagePath(p, 1, 1))) // cross-host move
      return PageRow(UrlNormalizer.sha256Hex(url), url, hash, h, status,
        redirect, "text/html; charset=utf-8", "", extract_ok = true,
        Nil, Nil)
    }

    // ---- status class ----
    val r = if (j == 0) 0 else rnd(p.seed, "status", i, j) % 100
    val (status, contentType, extractOk, redirect) =
      if (r < 70) (200, "text/html; charset=utf-8", true, "")
      else if (r < 76) (301, "text/html; charset=utf-8", true,
        pageUrl(p, i, (j * 7 + 1) % base))
      else if (r < 81) (404, "text/html; charset=utf-8", true, "")
      else if (r < 84) (429, "text/html; charset=utf-8", true, "")
      else if (r < 87) (500, "text/html; charset=utf-8", true, "")
      else if (r < 89) (304, "text/html; charset=utf-8", true, "")
      else if (r < 93) (200, "application/json", true, "")
      else (200, "text/html; charset=utf-8", false, "")

    val etag = if (rnd(p.seed, "etag", i, j) % 4 == 0) s"W/\"$i-$j\"" else ""

    // ---- spans (only meaningful for fetchable HTML pages) ----
    val nSpans = 3 + rnd(p.seed, "nspans", i, j) % 5
    val baseSpans = (0 until nSpans).map { k =>
      if (k % 3 == 2)
        Span("media", "", s"https://cdn.example.net/i$i/p$j/img$k.jpg", k)
      else {
        val words = (0 until 6).map(w =>
          vocab(rnd(p.seed, "word", i, j, k, w) % vocab.length)).mkString(" ")
        Span("text", s"Site $i page $j paragraph $k: $words.", "", k)
      }
    }
    // news-class pages carry page-embedded structured data: a JSON-LD
    // span (the corpus's stand-in for <script type="application/ld+json">)
    // so the B3 JSON-LD detector has real input to classify
    val spans =
      if (path.startsWith("/news/"))
        baseSpans :+ Span("jsonld",
          s"""{"@type":"NewsArticle","headline":"Site $i page $j"}""",
          "", nSpans)
      else baseSpans

    // ---- outlinks (raw hrefs, variant-encoded to exercise dedup) ----
    val links = scala.collection.mutable.ArrayBuffer.empty[String]
    if (status == 200 && contentType.startsWith("text/html") && extractOk) {
      (0 until p.outdegree).foreach { k =>
        val cross = k == p.outdegree - 1 && rnd(p.seed, "cross", i, j, k) % 4 == 0
        val ti = if (cross) (i + 1) % p.numHosts else i
        val tbase = if (ti == 0) p.pagesOf(0) - p.specialPages else p.pagesOf(ti)
        val tj = (j * 13 + k * 7 + 1) % tbase
        val tpath = pagePath(p, ti, tj)
        val turl = canonicalUrl(host(ti), tpath)
        links += (rnd(p.seed, "variant", i, j, k) % 6 match {
          case 0 => tpath // absolute-path relative
          case 1 => turl // canonical
          case 2 => s"HTTP://${host(ti).toUpperCase}:80$tpath?utm_source=x&fbclid=y"
          case 3 => s"$turl#section-$k"
          case 4 => s"$tpath?utm_campaign=z"
          case 5 => s"http://${host(ti)}$tpath"
        })
      }
      if (rnd(p.seed, "skiplink", i, j) % 5 == 0) {
        links += "mailto:contact@example.org"
        links += "javascript:void(0)"
      }
      if (rnd(p.seed, "deadlink", i, j) % 10 == 0)
        links += s"/missing/m-$j" // not in corpus → fetch error → retries
      if (i == 0 && j == 0) {
        links += "/ring/0"
        links += "/moved-1"
        links += "/moved-external"
      }
    }

    PageRow(UrlNormalizer.sha256Hex(url), url, hash, h, status, redirect,
      contentType, etag, extractOk, spans, links.toSeq)
  }

  def pageAt(p: CorpusParams, globalIdx: Long): PageRow = {
    val (i, j) = p.locate(globalIdx)
    page(p, i, j)
  }

  /** Deterministic HTML realization of page (i, j): the page's spans and
    * metadata wrapped in the shapes the reference's content extractor
    * consumes (fetcher/extractor_test.go fixtures). Variant knobs are all
    * exercised across the corpus: missing <title> (og:title fallback),
    * missing <article> (stripped-body fallback), missing description
    * (og:description fallback), all four published-date patterns plus
    * none, script/style/nav/header/footer noise to strip. Output obeys
    * the HtmlOps input contract (double-quoted attrs in source order,
    * no entities, non-empty values, at most one <article>).
    */
  def pageHtml(p: CorpusParams, i: Int, j: Int): String = {
    val pg = page(p, i, j)
    val hasTitle = rnd(p.seed, "h_title", i, j) % 5 != 0
    val hasArticle = rnd(p.seed, "h_article", i, j) % 4 != 0
    val hasAuthor = rnd(p.seed, "h_author", i, j) % 3 != 0
    val hasDesc = rnd(p.seed, "h_desc", i, j) % 3 != 0
    val hasCanon = rnd(p.seed, "h_canon", i, j) % 2 == 0
    val dateKind = rnd(p.seed, "h_date", i, j) % 6
    val titleText =
      s"Site $i Page $j: ${vocab(rnd(p.seed, "h_tw", i, j) % vocab.length)}"
    val date = f"2024-${j % 12 + 1}%02d-${j % 28 + 1}%02dT10:30:00Z"
    val sb = new StringBuilder("<html>\n<head>\n")
    if (hasTitle) sb ++= s"  <title> $titleText </title>\n"
    val ogType = if (pg.url.contains("/news/")) "article" else "website"
    sb ++= s"""  <meta property="og:type" content="$ogType">""" + "\n"
    sb ++= s"""  <meta property="og:title" content="OG $titleText">""" + "\n"
    if (hasDesc)
      sb ++= s"""  <meta name="description" content="Description of site $i page $j.">""" + "\n"
    sb ++= s"""  <meta property="og:description" content="OG description $i-$j.">""" + "\n"
    sb ++= s"""  <meta property="og:image" content="https://cdn.example.net/i$i/p$j/og.jpg">""" + "\n"
    if (hasAuthor)
      sb ++= s"""  <meta name="author" content="Reporter ${rnd(p.seed, "h_auth", i, j) % 9}">""" + "\n"
    val kw1 = vocab(rnd(p.seed, "h_kw1", i, j) % vocab.length)
    val kw2 = vocab(rnd(p.seed, "h_kw2", i, j) % vocab.length)
    sb ++= s"""  <meta name="keywords" content="$kw1, $kw2">""" + "\n"
    dateKind match {
      case 0 =>
        sb ++= s"""  <meta property="article:published_time" content="$date">""" + "\n"
      case 1 => sb ++= s"""  <meta name="datePublished" content="$date">""" + "\n"
      case 2 => sb ++= s"""  <meta name="pubdate" content="$date">""" + "\n"
      case _ => ()
    }
    if (hasCanon)
      sb ++= s"""  <link rel="canonical" href="${pg.url}">""" + "\n"
    sb ++= "  <style>body { margin: 0; }</style>\n"
    sb ++= "</head>\n<body>\n"
    sb ++= s"  <header>Site $i masthead</header>\n"
    sb ++= "  <nav>home | news | about</nav>\n"
    val inner = new StringBuilder
    pg.spans.foreach { s =>
      s.kind match {
        case "text" => inner ++= s"    <p>${s.text}</p>\n"
        case "media" => inner ++= s"""    <img src="${s.media_ref}">""" + "\n"
        case "jsonld" =>
          inner ++= s"""    <script type="application/ld+json">${s.text}</script>""" + "\n"
        case _ => ()
      }
    }
    if (dateKind == 3)
      inner ++= s"""    <time datetime="$date">published</time>""" + "\n"
    inner ++= s"    <script>var page = $j;</script>\n"
    pg.links.zipWithIndex.foreach { case (l, k) =>
      if (!l.startsWith("javascript:"))
        inner ++= s"""    <a href="$l">link $k</a>""" + "\n"
    }
    if (hasArticle) {
      sb ++= "  <article>\n"
      sb ++= s"    <h1>$titleText</h1>\n"
      sb ++= inner
      sb ++= "  </article>\n"
      sb ++= "  <div>Sidebar content outside the article.</div>\n"
    } else sb ++= inner
    sb ++= s"  <footer>Footer for site $i</footer>\n"
    sb ++= "</body>\n</html>"
    sb.toString
  }

  def allPages(p: CorpusParams): IndexedSeq[PageRow] =
    (0L until p.totalPages).map(pageAt(p, _))

  /** robots fixtures: every robotsModulo-th host publishes rules; the next
    * host class returns 404 (allow-all); host `robotsModulo` blocks
    * everything (its seed dies robots_blocked).
    */
  def robots(p: CorpusParams): Seq[RobotsRow] =
    (0 until p.numHosts).flatMap { i =>
      if (i == p.robotsModulo && p.numHosts > p.robotsModulo)
        Some(RobotsRow(host(i), "User-agent: *\nDisallow: /\n", 200))
      else if (i % p.robotsModulo == 0)
        Some(RobotsRow(host(i),
          "User-agent: *\nDisallow: /private/\nDisallow: /assets/\n", 200))
      else if (i % p.robotsModulo == 1)
        Some(RobotsRow(host(i), "not found", 404))
      else None
    }

  /** One seed per host: the site root (depth 0, priority 5, origin manual). */
  def seeds(p: CorpusParams): Seq[Seed] =
    (0 until p.numHosts).map(i => seedAt(i))

  /** Splittable point form of [[seeds]] (seedAt(i) == seeds(p)(i)) — the
    * distributed-seeding generator for `range(numHosts).map`.
    */
  def seedAt(i: Long): Seed =
    Seed(canonicalUrl(host(i.toInt), "/"), s"src-$i")

  /** The reference's seed-list fixture re-expressed as corpus rows
    * (crawler/fixtures/fixture-news-site-com/, FIXTURES.md §4).
    */
  def fixtureNewsSite(): (Seq[PageRow], Seq[RobotsRow], Seq[Seed]) = {
    val h = "fixture-news-site.com"
    def mk(path: String, spans: Seq[Span], links: Seq[String]) = {
      val url = canonicalUrl(h, path)
      PageRow(UrlNormalizer.sha256Hex(url), url, UrlNormalizer.sha256Hex(url),
        h, 200, "", "text/html; charset=utf-8", "", extract_ok = true,
        spans, links)
    }
    val p1 = mk("/article/local-tech-company-expands",
      Seq(Span("text", "Local tech company expands operations downtown.", "", 0),
        Span("media", "", "https://fixture-news-site.com/images/expansion.jpg", 1),
        Span("text", "The company will add fifty new positions.", "", 2)),
      Seq("/article/downtown-robbery-arrests", "/listings/businesses"))
    val p2 = mk("/article/downtown-robbery-arrests",
      Seq(Span("text", "Police made two arrests after a downtown robbery.", "", 0),
        Span("text", "The investigation is ongoing.", "", 1)),
      Seq("/article/local-tech-company-expands", "/listings/businesses"))
    val p3 = mk("/listings/businesses",
      Seq(Span("text", "Directory of local businesses.", "", 0),
        Span("media", "", "https://fixture-news-site.com/images/directory.png", 1)),
      Seq("/article/local-tech-company-expands",
        "/article/downtown-robbery-arrests"))
    (Seq(p1, p2, p3), Nil,
      Seq(Seed(canonicalUrl(h, "/article/local-tech-company-expands"), "fixture-src")))
  }
}
