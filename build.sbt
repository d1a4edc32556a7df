ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "northcloudspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes straight to this process's stdout, NOT through the
// sbt logger — the bench contract is ONE clean JSON line with no [info]
// prefix (driver parses stdout).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 48g default: the crawl bench is GC-bound when the heap is tight —
  // measured eff 0.39 at 8g vs 0.78 at 24g (600k hosts), and at 24g the
  // p4 drain still intermittently fell into a GC spiral (batch-1 fetch
  // 21 s → 232 s on the identical job; 48g + GC log showed young pauses
  // only and the stage back at 21 s). Local-mode Spark is ONE JVM for
  // the driver and every executor thread, so sizing the heap for the
  // 4-thread level is the honest N vs 4N model: on a real cluster each
  // of the 4 executors brings its OWN heap — sharing one p1-sized heap
  // would tax the hi level with GC a cluster never pays. Box has
  // 128 GiB; 48g leaves headroom for tmpfs state + external load.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
