package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R3 domain aggregates over a discovered_links table (reference:
  * database/domain_aggregate_repository.go:176-243 and the ratio
  * expressions at 307-323).
  *
  * Shape notes for 10^10 links: ONE hash-partitioned groupBy on `domain`
  * with map-side partial aggregation (every aggregate here combines);
  * the state join is a broadcast (domain-state tables are operator
  * curation, small by nature).
  */
object DomainViews {

  /** Per-domain rollup:
    *   - link_count, source_count = COUNT(DISTINCT source_id)
    *   - avg_depth (float8 in the reference)
    *   - first_seen/last_seen = MIN/MAX(discovered_at)
    *   - ok_ratio   = 2xx share of rows WITH an http_status, else NULL
    *   - html_ratio = 'text/html%' share of rows WITH a content_type,
    *     else NULL (COUNT(col) skips NULLs — exactly the CASE WHEN
    *     COUNT(col) > 0 guard of okRatioExpr/htmlRatioExpr)
    *   - status from the LEFT-joined state table, default 'active'; notes.
    */
  def aggregate(
      spark: SparkSession,
      links: DataFrame,
      domainStates: Option[DataFrame] = None, // (domain, status, notes)
      minLinkCount: Long = 0L,
      limit: Int = 100,
      offset: Int = 0): DataFrame = {
    val states = domainStates.getOrElse {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("domain", StringType),
          StructField("status", StringType), StructField("notes", StringType))))
    }
    links
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("link_count"),
        countDistinct(col("source_id")).as("source_count"),
        avg(col("depth")).as("avg_depth"),
        min(col("discovered_at")).as("first_seen"),
        max(col("discovered_at")).as("last_seen"),
        when(count(col("http_status")) > 0,
          count(when(col("http_status").between(200, 299), 1)).cast("double") /
            count(col("http_status")).cast("double")).as("ok_ratio"),
        when(count(col("content_type")) > 0,
          count(when(col("content_type").startsWith("text/html"), 1)).cast("double") /
            count(col("content_type")).cast("double")).as("html_ratio"))
      .join(broadcast(states), Seq("domain"), "left")
      .select(col("domain"), coalesce(col("status"), lit("active")).as("status"),
        col("link_count"), col("source_count"), col("avg_depth"),
        col("first_seen"), col("last_seen"), col("ok_ratio"),
        col("html_ratio"), col("notes"))
      .filter(col("link_count") >= minLinkCount)
      .orderBy(desc("link_count"), asc("domain"))
      .offset(math.max(offset, 0)).limit(math.max(limit, 0))
  }

  /** R5 one-domain link page + total count
    * (domain_aggregate_repository.go:132-174): the filtered view
    * materializes ONCE (localCheckpoint) and serves both the page read
    * and the count — the repository's two statements, one scan. Ordering
    * is discovered_at DESC with a url ASC tie-break for determinism (the
    * reference orders by discovered_at alone).
    */
  def linksPage(links: DataFrame, domain: String, limit: Int, offset: Int)
      : (DataFrame, Long) = {
    val of = links.filter(col("domain") === domain).localCheckpoint()
    (of.orderBy(desc("discovered_at"), asc("url"))
       .offset(math.max(offset, 0)).limit(math.max(limit, 0)),
      of.count())
  }
}
