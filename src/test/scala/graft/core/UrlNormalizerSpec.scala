package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Canonicalization vectors ported verbatim from the reference
  * (crawler/internal/frontier/normalize_test.go:17-54, 80-184) plus
  * ScalaCheck properties (idempotency, hash shape).
  */
class UrlNormalizerSpec extends AnyFunSuite {

  /** Deterministic property runner (no scalatestplus bridge in this env). */
  private def forAll[A](gen: Gen[A], n: Int = 300)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val okVectors: Seq[(String, String, String)] = Seq(
    ("lowercase scheme", "HTTP://Example.com/Path", "https://example.com/Path"),
    ("lowercase host", "https://EXAMPLE.COM/path", "https://example.com/path"),
    ("upgrade http to https", "http://example.com/path", "https://example.com/path"),
    ("remove default https port", "https://example.com:443/path", "https://example.com/path"),
    ("remove default http port", "http://example.com:80/path", "https://example.com/path"),
    ("keep non-default port", "https://example.com:8080/path", "https://example.com:8080/path"),
    ("remove trailing slash", "https://example.com/path/", "https://example.com/path"),
    ("keep root slash", "https://example.com/", "https://example.com/"),
    ("path only no query", "https://example.com/news/article-123", "https://example.com/news/article-123"),
    ("resolve dot segments", "https://example.com/a/b/../c", "https://example.com/a/c"),
    ("resolve current dir segments", "https://example.com/a/./b", "https://example.com/a/b"),
    ("remove fragment", "https://example.com/path#section", "https://example.com/path"),
    ("sort query params", "https://example.com/path?z=1&a=2", "https://example.com/path?a=2&z=1"),
    ("strip utm params", "https://example.com/path?utm_source=twitter&id=1", "https://example.com/path?id=1"),
    ("strip fbclid", "https://example.com/path?fbclid=abc123&id=1", "https://example.com/path?id=1"),
    ("strip gclid", "https://example.com/path?gclid=xyz&page=2", "https://example.com/path?page=2"),
    ("strip all tracking params",
      "https://example.com/?utm_source=a&utm_medium=b&utm_campaign=c" +
        "&utm_term=d&utm_content=e&fbclid=f&gclid=g&gclsrc=h&dclid=i&msclkid=j&keep=yes",
      "https://example.com/?keep=yes"),
    ("empty query after stripping", "https://example.com/path?utm_source=x", "https://example.com/path")
  )

  private val errVectors: Seq[(String, String)] = Seq(
    ("empty string", ""),
    ("invalid url", "://not-a-url"),
    ("missing scheme", "example.com/path")
  )

  test("NormalizeURL vectors (reference normalize_test.go:17-54)") {
    okVectors.foreach { case (name, in, want) =>
      assert(UrlNormalizer.normalize(in) == Right(want), s"case: $name input: $in")
    }
    errVectors.foreach { case (name, in) =>
      assert(UrlNormalizer.normalize(in).isLeft, s"case: $name input: $in")
    }
  }

  test("URLHash equivalent URLs hash identically") {
    val h1 = UrlNormalizer.urlHash("HTTP://Example.com/path?b=2&a=1")
    val h2 = UrlNormalizer.urlHash("https://example.com/path?a=1&b=2")
    assert(h1.isRight && h1 == h2)
  }

  test("URLHash is 64 lowercase hex chars") {
    val Right(h) = UrlNormalizer.urlHash("https://example.com"): @unchecked
    assert(h.length == 64)
    assert(h.forall(c => "0123456789abcdef".contains(c)))
  }

  test("URLHash differs for different URLs") {
    val h1 = UrlNormalizer.urlHash("https://example.com/page-a")
    val h2 = UrlNormalizer.urlHash("https://example.com/page-b")
    assert(h1 != h2)
  }

  test("URLHash errors") {
    assert(UrlNormalizer.urlHash("").isLeft)
    assert(UrlNormalizer.urlHash("://bad").isLeft)
  }

  test("ExtractHost vectors (reference normalize_test.go:148-161)") {
    assert(UrlNormalizer.extractHost("https://example.com/path") == Right("example.com"))
    assert(UrlNormalizer.extractHost("https://example.com:8080/path") == Right("example.com"))
    assert(UrlNormalizer.extractHost("https://www.example.com/path") == Right("www.example.com"))
    assert(UrlNormalizer.extractHost("https://EXAMPLE.COM/path") == Right("example.com"))
    assert(UrlNormalizer.extractHost("").isLeft)
    assert(UrlNormalizer.extractHost("://bad").isLeft)
  }

  test("known sha256 vector") {
    // sha256("abc") — FIPS 180-2 appendix B.1 example.
    assert(UrlNormalizer.sha256Hex("abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  private val pathSeg = Gen.oneOf(
    "a", "b", "news", "article-123", "x1", ".", "..", "Z")
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "Https")
    host <- Gen.oneOf("example.com", "EXAMPLE.com", "sub.Example.COM",
      "example.com:8080", "example.com:80", "example.com:443")
    nseg <- Gen.choose(0, 4)
    segs <- Gen.listOfN(nseg, pathSeg)
    slash <- Gen.oneOf("", "/")
    q <- Gen.oneOf("", "?z=1&a=2", "?utm_source=x", "?b=2&b=1&a=3",
      "?gclid=1&keep=2", "?a=hello+world&b=%20x")
    frag <- Gen.oneOf("", "#sec")
  } yield s"$scheme://$host/${segs.mkString("/")}$slash$q$frag"

  test("property: normalize reaches a fixpoint by the second application") {
    // Note: like the reference, a path of just slashes ("//") normalizes to
    // an empty path on the first pass and to "/" on the second — the Go code
    // (normalize.go:176-184) TrimRights the cleaned "/" away, then re-parsing
    // the empty path yields "/". So the pinned property is fixpoint-after-one,
    // not strict idempotency.
    forAll(urlGen) { u =>
      val once = UrlNormalizer.normalize(u)
      assert(once.isRight, s"should normalize: $u")
      val twice = once.flatMap(UrlNormalizer.normalize)
      val thrice = twice.flatMap(UrlNormalizer.normalize)
      assert(thrice == twice, s"no fixpoint: $u -> $once -> $twice -> $thrice")
    }
  }

  test("property: normalized URLs always https, no fragment, no tracking") {
    forAll(urlGen) { u =>
      UrlNormalizer.normalize(u) match {
        case Right(n) =>
          assert(n.startsWith("https://"))
          assert(!n.contains("#"))
          assert(!n.contains("utm_") && !n.contains("gclid"))
        case Left(_) => fail(s"should normalize: $u")
      }
    }
  }

  test("property: hash matches sha256 of normalized form") {
    forAll(urlGen) { u =>
      (UrlNormalizer.normalize(u), UrlNormalizer.urlHash(u)) match {
        case (Right(n), Right(h)) => assert(h == UrlNormalizer.sha256Hex(n))
        case other                => fail(s"unexpected: $other")
      }
    }
  }

  test("GoUrl.pathClean matches Go path.Clean behavior") {
    assert(GoUrl.pathClean("") == ".")
    assert(GoUrl.pathClean("/") == "/")
    assert(GoUrl.pathClean("/a/b/../c") == "/a/c")
    assert(GoUrl.pathClean("/a/./b") == "/a/b")
    assert(GoUrl.pathClean("/a//b") == "/a/b")
    assert(GoUrl.pathClean("/a/b/..") == "/a")
    assert(GoUrl.pathClean("/a/../..") == "/")
    assert(GoUrl.pathClean("/..") == "/")
    assert(GoUrl.pathClean("a/../..") == "..")
    assert(GoUrl.pathClean("/a/b/") == "/a/b")
  }

  test("query escape matches Go url.QueryEscape") {
    assert(GoUrl.queryEscape("hello world") == "hello+world")
    assert(GoUrl.queryEscape("a&b=c") == "a%26b%3Dc")
    assert(GoUrl.queryEscape("a.b-c_d~e") == "a.b-c_d~e")
    assert(GoUrl.queryEscape("ü") == "%C3%BC") // UTF-8 byte-wise like Go
  }

  test("multi-valued keys keep value order after sort") {
    assert(UrlNormalizer.normalize("https://example.com/p?b=2&b=1&a=3") ==
      Right("https://example.com/p?a=3&b=2&b=1"))
  }
}
