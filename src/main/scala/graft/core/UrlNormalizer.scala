package graft.core

import java.security.MessageDigest

/** URL canonicalization, hashing and host extraction — the dedup and
  * partition keys of the whole engine.
  *
  * Semantics mirror the reference bit-for-bit (reference:
  * crawler/internal/frontier/normalize.go:49-184, verified against the
  * vectors in crawler/internal/frontier/normalize_test.go:17-54):
  * lowercase scheme+host, http→https upgrade, strip default ports 80/443
  * (for either the original or the upgraded scheme), drop fragment, strip
  * tracking params, sort remaining query keys alphabetically (values keep
  * their original order per key), resolve dot segments, trim trailing
  * slashes (keeping root "/").
  */
object UrlNormalizer {

  /** Tracking params stripped during normalization
    * (reference: crawler/internal/frontier/normalize.go:19-30).
    */
  private val trackingParams: Set[String] = Set(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "fbclid", "gclid", "gclsrc", "dclid", "msclkid"
  )

  private val defaultPorts: Map[String, String] =
    Map("http" -> "80", "https" -> "443")

  /** reference: crawler/internal/frontier/normalize.go:49-71 */
  def normalize(rawUrl: String): Either[String, String] = {
    if (rawUrl.isEmpty) return Left("normalize url: empty input")
    GoUrl.parse(rawUrl) match {
      case Left(e) => Left(s"normalize url: $e")
      case Right(u) =>
        if (u.scheme.isEmpty || u.host.isEmpty)
          Left("normalize url: missing scheme or host")
        else {
          val originalScheme = u.scheme // parse already lowercased it
          val upgraded = u.copy(
            scheme = "https",
            host = normalizeHost(u, originalScheme),
            rawQuery = buildCleanQuery(GoUrl.parseQuery(u.rawQuery)),
            path = normalizePath(u.path)
          )
          Right(GoUrl.render(upgraded))
        }
    }
  }

  /** reference: crawler/internal/frontier/normalize.go:75-84 */
  def urlHash(rawUrl: String): Either[String, String] =
    normalize(rawUrl).map(sha256Hex)

  /** reference: crawler/internal/frontier/normalize.go:87-102 */
  def extractHost(rawUrl: String): Either[String, String] = {
    if (rawUrl.isEmpty) return Left("extract host: empty input")
    GoUrl.parse(rawUrl) match {
      case Left(e) => Left(s"extract host: $e")
      case Right(u) =>
        if (u.scheme.isEmpty || u.host.isEmpty)
          Left("extract host: missing scheme or host")
        else Right(u.hostname.toLowerCase)
    }
  }

  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** reference: crawler/internal/frontier/normalize.go:116-132 */
  private def normalizeHost(u: GoUrl.Url, originalScheme: String): String = {
    val hostname = u.hostname.toLowerCase
    val port = u.port
    if (port.isEmpty) hostname
    else if (Seq(originalScheme, "https")
        .exists(s => defaultPorts.get(s).contains(port))) hostname
    else s"$hostname:$port"
  }

  /** reference: crawler/internal/frontier/normalize.go:137-172. Keys sorted,
    * per-key values in original order, Go QueryEscape encoding.
    */
  private def buildCleanQuery(
      values: scala.collection.Map[String, Vector[String]]): String = {
    val keys = values.keysIterator.filterNot(trackingParams).toArray
    if (keys.isEmpty) return ""
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    val sb = new StringBuilder
    var first = true
    keys.foreach { key =>
      values(key).foreach { v =>
        if (!first) sb.append('&')
        first = false
        sb.append(GoUrl.queryEscape(key))
        sb.append('=')
        sb.append(GoUrl.queryEscape(v))
      }
    }
    sb.toString
  }

  /** reference: crawler/internal/frontier/normalize.go:176-184 */
  private def normalizePath(p: String): String = {
    if (p.isEmpty || p == "/") "/"
    else {
      val cleaned = GoUrl.pathClean(p)
      cleaned.reverse.dropWhile(_ == '/').reverse
    }
  }
}
