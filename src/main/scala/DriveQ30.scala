import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

object DriveQ30 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"$tag%-24s run$i ${(System.nanoTime()-t0)/1e9}%7.3f")
    }
    // piece 1: explode shingles only
    time("explode-count") {
      docs.select(col("doc_id"), col("lang"), col("source"),
        explode(TextOps.shingles(col("text"), 3)).as("sh")).count()
    }
    // piece 2: groupBy collect_set (one exchange)
    time("grouped-count") {
      docs.select(col("doc_id"), col("lang"), col("source"),
        explode(TextOps.shingles(col("text"), 3)).as("sh"))
        .groupBy(col("lang"), col("source"), col("sh"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) <= 64).count()
    }
    // full query (current impl with checkpoint)
    time("full-current") {
      TextOps.ngramJaccardPairs(docs, 3, 0.05, maxDocFreq = 64L).count()
    }
    spark.stop()
  }
}
