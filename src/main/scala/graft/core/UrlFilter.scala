package graft.core

/** B2/B3: spider-mode URL pre-filtering and URL-pattern content
  * classification — predicates applied BEFORE fetching to avoid wasted I/O
  * (reference: crawler/internal/crawler/url_filter.go:9-113,
  * content_detector.go:84-126,311-326).
  */
object UrlFilter {

  /** url_filter.go:10-17 */
  private val ecommerceSegments: Set[String] =
    Set("shop", "store", "product", "products", "cart", "checkout")

  /** url_filter.go:20 */
  private val cdnAssetPrefixes: Seq[String] =
    Seq("/wp-content/uploads/", "/assets/", "/static/")

  /** url_filter.go:24-32: exact hosts or leading-dot suffixes. */
  private val nonContentHosts: Seq[String] = Seq(
    "play.google.com", "apps.apple.com", "itunes.apple.com",
    ".cloudfront.net", ".googleusercontent.com", ".fbcdn.net", ".twimg.com")

  /** content_detector.go:39-61 (shared with ContentUrl). */
  private val nonContentSegments: Set[String] = Set(
    "login", "signin", "signup", "register", "search", "contact", "about",
    "privacy", "terms", "tag", "category", "author", "page", "feed", "rss",
    "sitemap", "admin", "wp-admin", "account", "cart", "checkout")

  /** content_detector.go:64-80 keyed by path.Ext-style extension. */
  private val binaryExtensions: Set[String] = Set(
    ".pdf", ".xml", ".json", ".css", ".js", ".png", ".jpg", ".jpeg", ".gif",
    ".svg", ".ico", ".woff", ".zip", ".mp3", ".mp4")

  /** url_filter.go:38-65: skip off-source-host, non-content hosts, binary
    * extensions, CDN asset paths, non-content/e-commerce segments.
    * Empty sourceHost disables the off-domain check.
    */
  def shouldSkipUrl(rawUrl: String, sourceHost: String = ""): Boolean =
    GoUrl.parse(rawUrl) match {
      case Left(_) => true
      case Right(u) =>
        val lowerHost = u.hostname.toLowerCase
        if (sourceHost.nonEmpty && !lowerHost.equalsIgnoreCase(sourceHost)) true
        else if (isNonContentHost(lowerHost)) true
        else {
          val lowerPath = u.path.toLowerCase
          hasBinaryExtension(lowerPath) || isCdnAssetPath(lowerPath) ||
          hasNonContentOrEcommerceSegment(lowerPath)
        }
    }

  private def isNonContentHost(lowerHost: String): Boolean =
    nonContentHosts.exists { e =>
      if (e.startsWith(".")) lowerHost.endsWith(e) else lowerHost == e
    }

  private def hasBinaryExtension(lowerPath: String): Boolean = {
    val slash = lowerPath.lastIndexOf('/')
    val dot = lowerPath.lastIndexOf('.')
    dot > slash && dot >= 0 && binaryExtensions.contains(lowerPath.substring(dot))
  }

  private def isCdnAssetPath(lowerPath: String): Boolean =
    cdnAssetPrefixes.exists(lowerPath.startsWith)

  private def hasNonContentOrEcommerceSegment(lowerPath: String): Boolean =
    lowerPath.dropWhile(_ == '/').split("/", -1).exists(seg =>
      nonContentSegments.contains(seg) || ecommerceSegments.contains(seg))

  /** B3 URL-pattern classification: path substring → detected content type,
    * first match wins (content_detector.go:84-126), then the `.pdf` report
    * rule (line 129) — the URL-only slice of the detector (JSON-LD/og:type
    * need HTML, which the span model does not carry).
    */
  private val urlContentTypePatterns: Seq[(String, String)] = Seq(
    "/press/" -> "press_release", "/media/" -> "press_release",
    "/newsroom/" -> "press_release",
    "/events/" -> "event", "/event/" -> "event", "/calendar/" -> "event",
    "/upcoming/" -> "event",
    "/alert/" -> "advisory", "/alerts/" -> "advisory",
    "/advisory/" -> "advisory", "/advisories/" -> "advisory",
    "/bulletin/" -> "advisory", "/bulletins/" -> "advisory",
    "/reports/" -> "report", "/report/" -> "report",
    "/blotter/" -> "blotter", "/blotters/" -> "blotter",
    "/incidents/" -> "blotter", "/arrests/" -> "blotter",
    "/investors/" -> "company_announcement",
    "/investor/" -> "company_announcement",
    "/updates/" -> "company_announcement",
    "/obituaries/" -> "obituary", "/obituary/" -> "obituary",
    "/obits/" -> "obituary",
    "/recipes/" -> "recipe", "/recipe/" -> "recipe", "/food/" -> "recipe",
    "/jobs/" -> "job", "/careers/" -> "job",
    "/rfp/" -> "rfp", "/rfps/" -> "rfp", "/tenders/" -> "rfp",
    "/tender/" -> "rfp", "/procurement/" -> "rfp",
    "/solicitations/" -> "rfp", "/solicitation/" -> "rfp", "/bids/" -> "rfp"
  )

  /** Returns the detected type or "" (DetectedContentUnknown). The `.pdf`
    * report rule comes FIRST, before the pattern table — the order of
    * detectContentTypeFromURL (content_detector.go:311-326), so
    * `/events/brochure.pdf` is a report, not an event.
    */
  def detectContentTypeFromUrl(rawUrl: String): String =
    GoUrl.parse(rawUrl) match {
      case Left(_) => ""
      case Right(u) =>
        val lowerPath = u.path.toLowerCase
        if (lowerPath.endsWith(".pdf")) "report"
        else urlContentTypePatterns.collectFirst {
          case (pat, t) if lowerPath.contains(pat) => t
        }.getOrElse("")
    }

  /** JSON-LD @type → detected content type (content_detector.go:331-340).
    * FIXED evaluation order: the reference iterates a Go map (random
    * order) per script, so a script containing two collectible types is
    * nondeterministic there; this table order is the defined behavior.
    */
  val jsonldToDetected: Seq[(String, String)] = Seq(
    "NewsArticle" -> "article", "Article" -> "article",
    "BlogPosting" -> "blog_post", "PressRelease" -> "press_release",
    "Event" -> "event", "SpecialAnnouncement" -> "advisory",
    "Report" -> "report")

  /** First non-empty detection across ld+json script bodies; substring
    * match on `"@type":"X"` with or without one space after the colon
    * (content_detector.go:341-358).
    */
  def detectContentTypeFromJsonLd(scripts: Seq[String]): String =
    scripts.iterator.map(_.trim).filter(_.nonEmpty).map { text =>
      jsonldToDetected.collectFirst {
        case (t, c) if text.contains("\"@type\":\"" + t + "\"") ||
          text.contains("\"@type\": \"" + t + "\"") => c
      }.getOrElse("")
    }.find(_.nonEmpty).getOrElse("")

  /** Combined detection: JSON-LD, then URL patterns, then og:type=article
    * (content_detector.go:361-374).
    */
  def detectContentTypeFromHtml(jsonldScripts: Seq[String], ogType: String,
      pageUrl: String): String = {
    val fromJsonLd = detectContentTypeFromJsonLd(jsonldScripts)
    if (fromJsonLd.nonEmpty) fromJsonLd
    else {
      val fromUrl = detectContentTypeFromUrl(pageUrl)
      if (fromUrl.nonEmpty) fromUrl
      else if (ogType.equalsIgnoreCase("article")) "article"
      else ""
    }
  }

  /** Collector gate: structured content we collect, plus the content-URL
    * heuristic fallback as plain "article" (content_detector.go:377-387).
    */
  def isStructuredContentPage(jsonldScripts: Seq[String], ogType: String,
      pageUrl: String): (Boolean, String) = {
    val ct = detectContentTypeFromHtml(jsonldScripts, ogType, pageUrl)
    if (ct.nonEmpty) (true, ct)
    else if (ContentUrl.isContentUrl(pageUrl)) (true, "article")
    else (false, "")
  }
}
