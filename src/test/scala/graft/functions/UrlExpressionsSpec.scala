package graft.functions

import graft.SparkTestBase
import graft.core.UrlNormalizer
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

class UrlExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val urls = Seq(
    "HTTP://Example.com:80/a/./b/../c?utm_source=x&z=1&a=2#f",
    "https://EXAMPLE.COM/path/",
    "://broken",
    "mailto:x@y.z",
    "https://sub.example.org:8443/deep/path?q=hello+world"
  ).toDF("u")

  test("native expressions agree with the pure functions and the UDFs") {
    val rows = urls.select(
      col("u"),
      UrlExpressions.normalize_url_native(col("u")).as("n1"),
      UrlUdfs.normalize_url(col("u")).as("n2"),
      UrlExpressions.url_hash_native(col("u")).as("h1"),
      UrlUdfs.url_hash(col("u")).as("h2"),
      UrlExpressions.extract_host_native(col("u")).as("e1"),
      UrlUdfs.extract_host(col("u")).as("e2")
    ).collect()
    rows.foreach { r =>
      val u = r.getString(0)
      assert(r.get(1) == r.get(2), s"normalize mismatch for $u")
      assert(r.get(3) == r.get(4), s"hash mismatch for $u")
      assert(r.get(5) == r.get(6), s"host mismatch for $u")
      assert(Option(r.getString(1)) == UrlNormalizer.normalize(u).toOption)
    }
    // error inputs → null, good inputs → non-null
    assert(rows.count(_.isNullAt(1)) == 2)
  }

  test("host_bucket matches the engine's MurmurHash3 bucket function") {
    import spark.implicits._
    val nb = 16
    val hosts = Seq("example.com", "a.example.org", "h0.bench.local", "",
      "xn--idn-tl0a.example", "host-with-очень-unicode.example")
    val got = hosts.toDF("h")
      .select(UrlExpressions.host_bucket(col("h"), nb)).as[Int].collect()
    val want = hosts.map(h =>
      (scala.util.hashing.MurmurHash3.stringHash(h) & 0x7fffffff) % nb)
    assert(got.toSeq == want)
  }

  test("registered SQL functions work end to end") {
    UrlExpressions.register(spark)
    UrlUdfs.register(spark)
    urls.createOrReplaceTempView("urls_t")
    val out = spark.sql(
      """SELECT u, normalize_url_native(u) AS a, normalize_url(u) AS b,
                url_hash_native(u) AS c, extract_host_native(u) AS d
         FROM urls_t""").collect()
    out.foreach { r =>
      assert(r.get(1) == r.get(2))
      if (!r.isNullAt(1)) assert(r.getString(2).startsWith("https://"))
    }
  }
}
