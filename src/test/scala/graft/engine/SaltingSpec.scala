package graft.engine

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Skew utilities: detection finds the hot key, salting spreads exactly
  * that key over multiple partitions without moving the rest, and the
  * salt is a pure function of the row key (bit-reproducible runs).
  */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val skewed = {
    val hot = (0 until 2000).map(i => ("mega.example.org", s"u$i"))
    val cold = (0 until 40).flatMap(h =>
      (0 until 5).map(i => (s"h$h.example.org", s"c$h-$i")))
    (hot ++ cold).toDF("host", "url_hash")
  }

  test("detectHeavyKeys flags only the skewed key") {
    val heavy = Salting.detectHeavyKeys(skewed, col("host"), skewRatio = 10.0)
    assert(heavy == Set("mega.example.org"))
  }

  test("saltedRepartition spreads the hot key, keeps rows, stays deterministic") {
    val heavy = Set("mega.example.org")
    val out = Salting.saltedRepartition(skewed, col("host"), col("url_hash"),
      heavy, saltFactor = 8, numPartitions = 16)
    // no rows lost or duplicated, no helper column leaks
    assert(out.count() == skewed.count())
    assert(out.columns.toSeq == Seq("host", "url_hash"))
    // the hot key's rows now span multiple partitions...
    val hotParts = out.filter($"host" === "mega.example.org")
      .select(spark_partition_id()).distinct().count()
    assert(hotParts > 1, s"hot key spread over $hotParts partitions")
    // ...while an unsalted repartition pins them to exactly one
    val pinned = skewed.repartition(16, col("host"))
      .filter($"host" === "mega.example.org")
      .select(spark_partition_id()).distinct().count()
    assert(pinned == 1L)
    // determinism: the same input salts to the same partition layout
    val again = Salting.saltedRepartition(skewed, col("host"), col("url_hash"),
      heavy, saltFactor = 8, numPartitions = 16)
    def layout(df: org.apache.spark.sql.DataFrame) =
      df.select($"url_hash", spark_partition_id().as("p"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(layout(out) == layout(again))
  }
}
