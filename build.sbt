ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "myhadoopspark"
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
// The driver invokes `sbt runMain graft.Bench` and parses the LAST JSON
// line from a bounded stdout tail. Two sbt behaviors broke that in rounds
// 1-3 (BENCH_r0*.json all show parsed:null):
//   1. forked-run output is routed through sbt's logger by default, so
//      every program line gets an "[info] " prefix — not valid JSON;
//   2. sbt prints "[success] Total time: ..." AFTER the program exits,
//      so the program's JSON line is never the last stdout line.
// StdoutOutput sends the forked JVM's stdout straight through unprefixed,
// and showSuccess=false drops the trailing [success] line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // local[32] with cached sketch intermediates needs headroom; a tight
  // heap shows up as 1.5-10x GC-driven bench swings (box has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
