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
      case Right(u) => normalizeParsed(u)
    }
  }

  /** The post-parse half of [[normalize]] — lets hot per-link paths that
    * already hold the parsed URL skip a re-parse (identical semantics:
    * the parse result fully determines the output).
    */
  def normalizeParsed(u: GoUrl.Url): Either[String, String] =
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

  /** reference: crawler/internal/frontier/normalize.go:75-84 */
  def urlHash(rawUrl: String): Either[String, String] =
    normalize(rawUrl).map(sha256Hex)

  /** One-parse fusion of (normalize, urlHash, extractHost) for the
    * per-link hot path: returns (normalized, sha256(normalized),
    * raw-parse hostname lowercased) — exactly the triple the separate
    * calls produce, failing iff any of them fails (all three share the
    * same failure condition: unparseable input or empty scheme/host).
    * The separate calls parse the SAME string three times and normalize
    * it twice; at ~10^6 discovered links per micro-batch that repeat
    * work dominated the submission stage's CPU.
    */
  def normalizeHashHost(rawUrl: String)
      : Either[String, (String, String, String)] = {
    if (rawUrl.isEmpty) return Left("normalize url: empty input")
    GoUrl.parse(rawUrl) match {
      case Left(e) => Left(s"normalize url: $e")
      case Right(u) =>
        normalizeParsed(u).map { norm =>
          (norm, sha256Hex(norm), u.hostname.toLowerCase)
        }
    }
  }

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

  // one digest instance per thread (getInstance walks the provider list
  // per call) and table-driven hex: the previous per-byte f"%02x"
  // allocated a java.util.Formatter per BYTE — at ~10^6 hashes per
  // micro-batch that was ~3×10^7 formatter round-trips of pure overhead
  // on the link/contentHash hot path.
  @transient private lazy val sha256Local =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("SHA-256"))
  private val hexChars = "0123456789abcdef".toCharArray

  def sha256Hex(s: String): String = {
    val md = sha256Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
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
