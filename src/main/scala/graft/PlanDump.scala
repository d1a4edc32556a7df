package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for every declared query to a
  * directory (one file per query) — the plan evidence the optimization
  * round's `plans/r06/` artifacts are built from. Not part of the frozen
  * bench; session mirrors Bench's query-suite session (AQE on,
  * shuffle.partitions = cpus) so the captured plans are the benched ones.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix] [queryName...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "plan"
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.broadcastTimeout", "3600")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          System.err.println(s"[plandump] $name ok")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: $e")
        }
      }
    }
    spark.stop()
  }
}
