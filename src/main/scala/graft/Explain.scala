package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of one (or all)
  * SparkEntry queries over a given sf dir. Run with
  * `java -cp "target/scala-2.13/classes:SPARK_JARS" graft.Explain <sfDir> [name...]`
  * where SPARK_JARS globs /opt/spark/jars.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
