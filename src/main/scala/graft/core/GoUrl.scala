package graft.core

import scala.collection.mutable

/** Minimal re-implementation of the Go `net/url` + `path` package behaviors
  * that the reference URL canonicalizer depends on (reference:
  * crawler/internal/frontier/normalize.go:49-184). Derived from the publicly
  * documented semantics of Go's standard library, restricted to the ASCII web
  * URLs a crawler handles. Bit-exactness against the reference's test vectors
  * (crawler/internal/frontier/normalize_test.go:17-54) is verified in
  * UrlNormalizerSpec.
  */
object GoUrl {

  /** Parsed URL. `host` is the raw authority host (may include `:port`,
    * original case); `path` is the unescaped path; `rawQuery` is the raw
    * query string (no leading '?'); fragment is dropped (the normalizer
    * removes it anyway).
    */
  final case class Url(
      scheme: String, // lowercased, "" if absent
      userinfo: Option[String],
      host: String, // host[:port], original case
      opaque: String, // non-rooted rest for scheme-ful URLs (mailto:...)
      path: String, // unescaped
      rawQuery: String
  ) {

    /** Port per Go URL.Port(): text after the last ':' when it is all digits. */
    def port: String = {
      val i = host.lastIndexOf(':')
      if (i >= 0 && validOptionalPort(host.substring(i))) host.substring(i + 1)
      else ""
    }

    /** Hostname per Go URL.Hostname(): host with any valid port stripped. */
    def hostname: String = {
      val i = host.lastIndexOf(':')
      if (i >= 0 && validOptionalPort(host.substring(i))) host.substring(0, i)
      else host
    }
  }

  sealed trait Mode
  case object EncodePath extends Mode
  case object EncodeHost extends Mode
  case object EncodeQueryComponent extends Mode

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isHex(c: Char): Boolean =
    isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def unhex(c: Char): Int =
    if (isDigit(c)) c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else c - 'A' + 10

  private def validOptionalPort(p: String): Boolean =
    p.isEmpty || (p.charAt(0) == ':' && p.substring(1).forall(isDigit))

  /** Go net/url.Parse, for the subset we need. Fragment is stripped. */
  def parse(raw: String): Either[String, Url] = {
    val hashIdx = raw.indexOf('#')
    val noFrag = if (hashIdx >= 0) raw.substring(0, hashIdx) else raw
    for {
      schemeRest <- getScheme(noFrag)
      (schemeRaw, afterScheme) = schemeRest
      url <- parseAfterScheme(schemeRaw.toLowerCase, afterScheme)
    } yield url
  }

  /** Go getScheme: [alpha][alnum+-.]* before ':'. Empty scheme before ':' is
    * an error ("missing protocol scheme"); otherwise no colon / invalid char
    * means the whole string is scheme-less.
    */
  private def getScheme(s: String): Either[String, (String, String)] = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isAlpha(c)) ()
      else if (isDigit(c) || c == '+' || c == '-' || c == '.') {
        if (i == 0) return Right(("", s))
      } else if (c == ':') {
        if (i == 0) return Left("missing protocol scheme")
        return Right((s.substring(0, i), s.substring(i + 1)))
      } else return Right(("", s))
      i += 1
    }
    Right(("", s))
  }

  private def parseAfterScheme(scheme: String, s: String): Either[String, Url] = {
    // Query split happens before authority/path handling (Go parse()).
    val qIdx = s.indexOf('?')
    val (rest0, rawQuery) =
      if (qIdx >= 0) (s.substring(0, qIdx), s.substring(qIdx + 1)) else (s, "")

    if (!rest0.startsWith("/")) {
      if (scheme.nonEmpty)
        // Opaque URL (mailto:x) — host stays empty; normalizer rejects it.
        return Right(Url(scheme, None, "", rest0, "", rawQuery))
      val slash = rest0.indexOf('/')
      val seg = if (slash >= 0) rest0.substring(0, slash) else rest0
      if (seg.contains(':'))
        return Left("first path segment in URL cannot contain colon")
    }

    var rest = rest0
    var host = ""
    var userinfo: Option[String] = None
    if ((scheme.nonEmpty || !rest.startsWith("///")) && rest.startsWith("//")) {
      val a = rest.substring(2)
      val slash = a.indexOf('/')
      val (authority, r2) =
        if (slash >= 0) (a.substring(0, slash), a.substring(slash)) else (a, "")
      rest = r2
      val at = authority.lastIndexOf('@')
      val (ui, h) =
        if (at >= 0) (Some(authority.substring(0, at)), authority.substring(at + 1))
        else (None, authority)
      parseHost(h) match {
        case Left(e)   => return Left(e)
        case Right(ph) => host = ph
      }
      userinfo = ui
    }
    unescape(rest, EncodePath).map(p => Url(scheme, userinfo, host, "", p, rawQuery))
  }

  private def parseHost(h: String): Either[String, String] = {
    if (h.startsWith("[")) return Right(h) // IPv6 literal: pass through
    val i = h.lastIndexOf(':')
    if (i >= 0 && !validOptionalPort(h.substring(i)))
      return Left(s"invalid port ${h.substring(i)} after host")
    unescape(h, EncodeHost)
  }

  /** Go unescape: %XX must be two hex digits; '+' becomes space only in
    * query components. Operates on UTF-8 bytes like Go (a %C3%BC pair
    * decodes to 'ü').
    */
  def unescape(s: String, mode: Mode): Either[String, String] = {
    val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(in.length)
    var i = 0
    while (i < in.length) {
      val c = in(i).toChar
      if (c == '%') {
        if (i + 2 >= in.length ||
          !isHex(in(i + 1).toChar) || !isHex(in(i + 2).toChar))
          return Left("invalid URL escape")
        out.write((unhex(in(i + 1).toChar) << 4) | unhex(in(i + 2).toChar))
        i += 3
      } else if (c == '+' && mode == EncodeQueryComponent) {
        out.write(' '); i += 1
      } else { out.write(in(i)); i += 1 }
    }
    Right(new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Go shouldEscape per mode. */
  private def shouldEscape(c: Char, mode: Mode): Boolean = {
    if (isAlpha(c) || isDigit(c)) return false
    if (mode == EncodeHost) c match {
      case '!' | '$' | '&' | '\'' | '(' | ')' | '*' | '+' | ',' | ';' | '=' |
          ':' | '[' | ']' | '<' | '>' | '"' =>
        return false
      case _ => ()
    }
    c match {
      case '-' | '_' | '.' | '~' => false
      case '$' | '&' | '+' | ',' | '/' | ':' | ';' | '=' | '?' | '@' =>
        mode match {
          case EncodePath           => c == '?'
          case EncodeQueryComponent => true
          case EncodeHost           => true // subset already allowed above
        }
      case _ => true
    }
  }

  private val upperHex = "0123456789ABCDEF"

  /** Byte-wise escaping over the UTF-8 encoding, like Go's url.escape. */
  def escape(s: String, mode: Mode): String = {
    val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(in.length)
    var i = 0
    while (i < in.length) {
      val b = in(i) & 0xff
      val c = b.toChar
      if (b < 0x80 && !shouldEscape(c, mode)) sb.append(c)
      else if (c == ' ' && mode == EncodeQueryComponent) sb.append('+')
      else {
        sb.append('%')
        sb.append(upperHex.charAt((b >> 4) & 0xf))
        sb.append(upperHex.charAt(b & 0xf))
      }
      i += 1
    }
    sb.toString
  }

  /** Go url.QueryEscape. */
  def queryEscape(s: String): String = escape(s, EncodeQueryComponent)

  /** Go url.Values as produced by URL.Query(): parse errors skip the broken
    * pair and keep the rest (Query() ignores ParseQuery's error). Per-key
    * value order preserved.
    */
  def parseQuery(query: String): mutable.LinkedHashMap[String, Vector[String]] = {
    val m = mutable.LinkedHashMap.empty[String, Vector[String]]
    var rest = query
    while (rest.nonEmpty) {
      val amp = rest.indexOf('&')
      val pair = if (amp >= 0) rest.substring(0, amp) else rest
      rest = if (amp >= 0) rest.substring(amp + 1) else ""
      if (pair.nonEmpty && !pair.contains(';')) {
        val eq = pair.indexOf('=')
        val (k0, v0) =
          if (eq >= 0) (pair.substring(0, eq), pair.substring(eq + 1))
          else (pair, "")
        (unescape(k0, EncodeQueryComponent), unescape(v0, EncodeQueryComponent)) match {
          case (Right(k), Right(v)) =>
            m.updateWith(k) {
              case Some(vs) => Some(vs :+ v)
              case None     => Some(Vector(v))
            }
          case _ => () // skip broken pair, like Go's Query()
        }
      }
    }
    m
  }

  /** Go path.Clean. */
  def pathClean(p: String): String = {
    if (p.isEmpty) return "."
    val rooted = p.charAt(0) == '/'
    val n = p.length
    val out = new StringBuilder
    var r = 0
    var dotdot = 0
    if (rooted) { out.append('/'); r = 1; dotdot = 1 }
    while (r < n) {
      if (p.charAt(r) == '/') r += 1
      else if (p.charAt(r) == '.' && (r + 1 == n || p.charAt(r + 1) == '/')) r += 1
      else if (p.charAt(r) == '.' && r + 1 < n && p.charAt(r + 1) == '.' &&
        (r + 2 == n || p.charAt(r + 2) == '/')) {
        r += 2
        if (out.length > dotdot) {
          var w = out.length - 1
          while (w > dotdot && out.charAt(w) != '/') w -= 1
          out.setLength(w)
        } else if (!rooted) {
          if (out.nonEmpty) out.append('/')
          out.append("..")
          dotdot = out.length
        }
      } else {
        if ((rooted && out.length != 1) || (!rooted && out.length != 0))
          out.append('/')
        while (r < n && p.charAt(r) != '/') { out.append(p.charAt(r)); r += 1 }
      }
    }
    if (out.isEmpty) "." else out.toString
  }

  /** RFC 3986 §5.2 reference resolution (the subset Go's
    * URL.ResolveReference / colly's AbsoluteURL provides that link
    * discovery needs — crawler/internal/crawler/link_handler.go:58).
    * Dot segments are left in place: the normalizer's path.Clean resolves
    * them identically right after, so the normalized result is bit-equal.
    */
  def resolveReference(base: Url, ref: Url): Url = {
    if (ref.scheme.nonEmpty || ref.host.nonEmpty || ref.userinfo.isDefined) {
      val scheme = if (ref.scheme.nonEmpty) ref.scheme else base.scheme
      ref.copy(scheme = scheme)
    } else if (ref.opaque.nonEmpty) ref
    else if (ref.path.isEmpty && ref.rawQuery.isEmpty) base
    else if (ref.path.isEmpty) base.copy(rawQuery = ref.rawQuery)
    else {
      val merged =
        if (ref.path.startsWith("/")) ref.path
        else {
          val i = base.path.lastIndexOf('/')
          (if (i >= 0) base.path.substring(0, i + 1) else "/") + ref.path
        }
      base.copy(path = merged, rawQuery = ref.rawQuery)
    }
  }

  /** Resolve a raw href against a page URL, like colly's AbsoluteURL:
    * empty string when either side fails to parse.
    */
  def absoluteUrl(pageUrl: String, href: String): String =
    (parse(pageUrl), parse(href)) match {
      case (Right(b), Right(r)) => render(resolveReference(b, r))
      case _                    => ""
    }

  /** Go URL.String() for our field set (fragment already dropped; RawPath is
    * never carried, so the path is freshly escaped like Go does after Path
    * was reassigned).
    */
  def render(u: Url): String = {
    val sb = new StringBuilder
    if (u.scheme.nonEmpty) { sb.append(u.scheme); sb.append(':') }
    if (u.opaque.nonEmpty) sb.append(u.opaque)
    else {
      if (u.scheme.nonEmpty || u.host.nonEmpty || u.userinfo.isDefined) {
        if (u.host.nonEmpty || u.path.nonEmpty || u.userinfo.isDefined)
          sb.append("//")
        u.userinfo.foreach { ui => sb.append(ui); sb.append('@') }
        if (u.host.nonEmpty) sb.append(escape(u.host, EncodeHost))
      }
      val ep = escape(u.path, EncodePath)
      if (ep.nonEmpty && ep.charAt(0) != '/' && u.host.nonEmpty) sb.append('/')
      sb.append(ep)
    }
    if (u.rawQuery.nonEmpty) { sb.append('?'); sb.append(u.rawQuery) }
    sb.toString
  }
}
