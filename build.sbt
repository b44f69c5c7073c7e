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
// Heap sized to the machine (the local[N] JVM is driver AND all executors):
// at 8g the 100M-row scale section was execution-memory-bound — tasks
// spilled sort/shuffle buffers and GC dominated (write_append measured
// 77.9 s at 8g vs 24.9 s at 32g on a quiet machine, rewrite_data_files
// 66.1 s vs 26.9 s). 32g of the 128 GiB sandbox is the local analog of
// sizing executor memory to the node (optimization guide §5); override
// with SPARK_DRIVER_MEM. -Xms matches -Xmx so the first timed write does
// not pay the heap-growth stalls.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
