ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icebergcatalogbenchspark"
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
// Heap sized by measurement (the local[N] JVM is driver AND all executors):
// 8g left the 100M-row scale section execution-memory-bound (spill + GC),
// but the r21 32g pin was WORSE than 16g everywhere at local[32] — G1 on a
// pre-committed 32g heap sized a huge young gen and 32 allocation-heavy
// cores hit multi-second collection pauses (r22 bisect: the 13-entry sweep
// cluster ran 38.8 s at 16g vs 83.0 s at 32g, and back-to-back scale-only
// runs measured write_append 29.8 s vs 32.0, rewrite_data_files 34.8 vs
// 50.0, read_agg 3.18 vs 4.74 — plans/r22/bisect_heap_*.json,
// ab_scale_*.json). 16g is the measured optimum for this bench; override
// with SPARK_DRIVER_MEM (a real cluster sizes executor memory to the node
// instead — guide §5). -Xms matches -Xmx so the first timed write does not
// pay heap-growth stalls.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
