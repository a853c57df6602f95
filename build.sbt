ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "eaclshspark"
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
  // Periodic driver GC (default 30 MIN) is what drives ContextCleaner:
  // shuffle files, broadcasts and checkpoint blocks of finished queries
  // are only released after a GC collects their weak references. A
  // 46-query bench loop accumulated all of it for the whole run —
  // measured as walls GROWING across reps (6.4 → 12.2 → 23.3 s on the
  // facade) and late-run 50–100 s outliers; a 90 s cadence keeps the
  // session flat (spark_optimization_guide §5: unpersist when done).
  "-Dspark.cleaner.periodicGC.interval=90s",
  // ...and make that periodic System.gc() a CONCURRENT G1 cycle instead of
  // a stop-the-world full GC: at 960k-scale block-cache heaps the default
  // full collection paused multi-second every 90 s (weak refs still get
  // processed by the concurrent cycle, so ContextCleaner keeps draining).
  "-XX:+ExplicitGCInvokesConcurrent",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 26k+ JIT nmethods accumulate across one query's reps alone; the
  // 240 MB default forces code-cache sweeps/recompile churn late in a
  // 46-query bench loop (CPU-spike class). Plenty of headroom instead.
  "-XX:ReservedCodeCacheSize=512m",
)
