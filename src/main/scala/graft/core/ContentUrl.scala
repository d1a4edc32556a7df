package graft.core

import scala.util.matching.Regex

/** URL classification heuristics used for spider priority and the
  * binary-URL dead gate.
  *
  * - isContentUrl: reference crawler/internal/crawler/content_detector.go:184-283
  *   (built-in heuristics path; explicit per-source patterns also supported)
  * - isBinaryUrl: reference crawler/internal/fetcher/worker.go:62-74,509-526
  */
object ContentUrl {

  /** content_detector.go:12 */
  private val MinSlugWordCount = 4

  /** content_detector.go:39-61 */
  private val nonContentSegments: Set[String] = Set(
    "login", "signin", "signup", "register", "search", "contact", "about",
    "privacy", "terms", "tag", "category", "author", "page", "feed", "rss",
    "sitemap", "admin", "wp-admin", "account", "cart", "checkout"
  )

  /** content_detector.go:64-80 (detector's own list, shorter than the fetcher's) */
  private val detectorBinaryExtensions: Set[String] = Set(
    ".pdf", ".xml", ".json", ".css", ".js", ".png", ".jpg", ".jpeg", ".gif",
    ".svg", ".ico", ".woff", ".zip", ".mp3", ".mp4"
  )

  /** content_detector.go:133-176 */
  private val contentPathSegments: Set[String] = Set(
    "article", "story", "post", "news", "press", "media", "newsroom",
    "events", "event", "calendar", "upcoming", "alert", "alerts", "advisory",
    "advisories", "bulletin", "bulletins", "blotter", "blotters", "incidents",
    "arrests", "reports", "report", "investors", "investor", "updates",
    "obituaries", "obituary", "obits", "recipes", "recipe", "food", "jobs",
    "careers", "rfp", "rfps", "tenders", "tender", "procurement",
    "solicitations", "solicitation", "bids"
  )

  /** content_detector.go:179 */
  private val datePathPattern: Regex = """/\d{4}/\d{2}(/\d{2})?/[^/]+""".r

  /** fetcher/worker.go:62-69 */
  private val fetcherBinaryExtensions: Seq[String] = Seq(
    ".pdf", ".xml", ".json", ".css", ".js",
    ".png", ".jpg", ".jpeg", ".gif", ".svg", ".ico", ".webp",
    ".woff", ".woff2", ".ttf", ".eot",
    ".zip", ".gz", ".tar", ".rar",
    ".mp3", ".mp4", ".wav", ".ogg", ".avi", ".mov",
    ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx"
  )

  /** fetcher/worker.go:72-74 */
  private val binaryPathSubstrings: Seq[String] =
    Seq("downloadmp3", "download.php", "downloadfile")

  /** content_detector.go:184-190: explicit patterns, when present, decide alone. */
  def isContentUrl(pageUrl: String, explicitPatterns: Seq[Regex] = Nil): Boolean =
    if (explicitPatterns.nonEmpty)
      explicitPatterns.exists(_.findFirstIn(pageUrl).isDefined)
    else matchesBuiltInHeuristics(pageUrl)

  /** content_detector.go:204-229 */
  private def matchesBuiltInHeuristics(pageUrl: String): Boolean =
    GoUrl.parse(pageUrl) match {
      case Left(_) => false
      case Right(u) =>
        val path = u.path.reverse.dropWhile(_ == '/').reverse
        if (path.isEmpty) false
        else {
          val lowerPath = path.toLowerCase
          if (isBinaryPath(lowerPath)) false
          else {
            val segments = path.dropWhile(_ == '/').split("/", -1)
            if (segments.length == 1 && !hasLongSlug(segments(0))) false
            else
              hasDatePath(path) || hasContentPathSegment(segments) ||
              segments.exists(hasLongSlug)
          }
        }
    }

  /** content_detector.go:232-247 */
  private def isBinaryPath(lowerPath: String): Boolean = {
    val segments = lowerPath.dropWhile(_ == '/').split("/", -1)
    segments.exists(nonContentSegments.contains) ||
    detectorBinaryExtensions.exists(lowerPath.endsWith)
  }

  private def hasDatePath(path: String): Boolean =
    datePathPattern.findFirstIn(path).isDefined

  /** content_detector.go:256-265: content segment must not be the last one. */
  private def hasContentPathSegment(segments: Array[String]): Boolean = {
    val lastIndex = segments.length - 1
    segments.zipWithIndex.exists { case (seg, i) =>
      contentPathSegments.contains(seg.toLowerCase) && i < lastIndex
    }
  }

  /** content_detector.go:268-272 */
  private def hasLongSlug(segment: String): Boolean =
    segment.split("-", -1).length >= MinSlugWordCount

  /** fetcher/worker.go:509-526 */
  def isBinaryUrl(rawUrl: String): Boolean =
    GoUrl.parse(rawUrl) match {
      case Left(_) => false
      case Right(u) =>
        val lowerPath = u.path.toLowerCase
        fetcherBinaryExtensions.exists(lowerPath.endsWith) ||
        binaryPathSubstrings.exists(lowerPath.contains)
    }

  /** fetcher/worker.go:499-505: empty content type counts as HTML. */
  def isHtmlContent(contentType: String): Boolean =
    contentType.isEmpty || {
      val ct = contentType.toLowerCase
      ct.startsWith("text/html") || ct.contains("xhtml")
    }

  /** crawler/link_handler.go:100-122: skip empty, unparseable, or
    * non-http(s)-scheme links; relative (scheme-less) links pass.
    */
  def shouldSkipLink(link: String): Boolean =
    link.isEmpty || (GoUrl.parse(link) match {
      case Left(_)  => true
      case Right(u) => u.scheme.nonEmpty && u.scheme != "http" && u.scheme != "https"
    })
}
