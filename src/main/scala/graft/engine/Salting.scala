package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling utilities (SURVEY.md §4 "salted repartitioning for skewed
  * domains", north rule).
  *
  * Where skew can appear in the drain and how each spot is covered:
  *
  *  - the CLAIM (top-1 per host): an argmin aggregation with map-side
  *    partial combine (CrawlEngine.runBatch) — a host with 10^7 eligible
  *    rows reduces locally on every input partition, so no salt is needed;
  *  - JOIN-side skew (frontier ⋈ submissions on one hot key): AQE's
  *    skew-join splitting (enabled in every session);
  *  - heavy per-HOST stages where rows of one host must be processed
  *    together but the per-row work is independent (fetch/extract over a
  *    mega-host's claimed URLs when politeness is configured to allow >1
  *    claim/host, or per-host robots re-parsing): `saltedRepartition`
  *    below spreads one host's rows over `saltFactor` partitions while
  *    keeping a deterministic salt derived from the row key — politeness
  *    itself is still enforced at host level BEFORE salting (claim stage).
  */
object Salting {

  /** Deterministic salt in [0, saltFactor) derived from a row key column. */
  def saltCol(rowKey: Column, saltFactor: Int): Column =
    pmod(xxhash64(rowKey), lit(saltFactor)).cast("int")

  /** Repartition rows of heavy keys across saltFactor× more partitions:
    * rows whose `key` appears in `heavyKeys` get a per-row deterministic
    * salt appended to the distribution key; everything else keeps salt 0.
    * Distribution becomes (key, salt) — one hot host no longer pins a
    * single task.
    */
  def saltedRepartition(df: DataFrame, key: Column, rowKey: Column,
      heavyKeys: Set[String], saltFactor: Int, numPartitions: Int): DataFrame = {
    val isHeavy = key.isin(heavyKeys.toSeq: _*)
    df.withColumn("__salt",
        when(isHeavy, saltCol(rowKey, saltFactor)).otherwise(lit(0)))
      .repartition(numPartitions, key, col("__salt"))
      .drop("__salt")
  }

  /** Detect heavy keys: keys holding more than `threshold` of the rows of
    * an average key (a groupBy count — itself map-side combined).
    */
  def detectHeavyKeys(df: DataFrame, key: Column, skewRatio: Double = 10.0): Set[String] = {
    val counts = df.groupBy(key.as("k")).count()
    val avg = counts.agg(org.apache.spark.sql.functions.avg("count"))
      .first().getDouble(0)
    counts.filter(col("count") > avg * skewRatio)
      .select("k").collect().map(_.getString(0)).toSet
  }
}
