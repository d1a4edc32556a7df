package graft

import org.apache.spark.sql.SparkSession

/** Extra measurement harness (spark_optimization_guide §1.4) — NOT part
  * of the driver contract (graft.Bench is frozen): times individual
  * SparkEntry queries with repeated samples so steady-state cost
  * separates from first-touch cost (cold file/footer reads, codegen and
  * JIT warmup), and optionally through the noop sink so every column is
  * computed (count() lets the optimizer prune).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... java -cp ... graft.BenchExtra [q... ]
  * Env knobs: SPARK_GRAFT_CPUS (default 32), GRAFT_EXTRA_REPS (default 3),
  * GRAFT_EXTRA_NOOP=1 (noop sink instead of count).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_EXTRA_REPS", "3").toInt
    val noop = sys.env.contains("GRAFT_EXTRA_NOOP")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.broadcastTimeout", "3600")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same untimed session warmup as graft.Bench
    Seq("q22_token_stats", "q27_adaptive_interval", "q11_normalize_url")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
    names.foreach { n =>
      val samples = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"$n sample $i")
        val t0 = System.nanoTime()
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          if (noop) df.write.format("noop").mode("overwrite").save()
          else df.count()
        } catch { case e: Throwable =>
          System.err.println(s"[extra] $n failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s " + samples.map(s => f"$s%7.3f").mkString(" ") +
        f"  min=${samples.min}%7.3f")
    }
    spark.stop()
  }
}
