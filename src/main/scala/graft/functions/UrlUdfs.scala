package graft.functions

import graft.core.UrlNormalizer
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** The canonicalization trio (SURVEY.md §2.1) exposed as Spark functions.
  * Scala UDFs here (normalize needs the full Go-parity parser); errors map
  * to null so malformed URLs filter out of declarative pipelines.
  */
object UrlUdfs {
  val normalizeUrl: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((u: String) =>
      if (u == null) None else UrlNormalizer.normalize(u).toOption)

  val urlHash: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((u: String) =>
      if (u == null) None else UrlNormalizer.urlHash(u).toOption)

  val extractHost: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((u: String) =>
      if (u == null) None else UrlNormalizer.extractHost(u).toOption)

  def normalize_url(c: Column): Column = normalizeUrl(c)
  def url_hash(c: Column): Column = urlHash(c)
  def extract_host(c: Column): Column = extractHost(c)

  /** SQL registration: normalize_url / url_hash / extract_host. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("normalize_url", normalizeUrl)
    spark.udf.register("url_hash", urlHash)
    spark.udf.register("extract_host", extractHost)
  }
}
