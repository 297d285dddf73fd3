ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkasparkstreamingspark"
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
// Forked run output goes straight to stdout WITHOUT sbt's `[info] ` logger
// prefix — the driver parses Bench's one-line JSON from stdout, and the
// default LoggedOutput strategy made it unparseable in rounds 1 and 2.
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
  // 16g default: local[32] runs executors inside this one JVM; at sf0.1 an
  // 8g heap left cached+shuffle state close enough to the ceiling that long
  // GC pauses contaminated bench timings on the slower driver VM
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// The suite runs the FULL query catalog through two audit specs (cache
// hygiene + plan shape) plus the hostile/replay programs in ONE forked JVM;
// at ~300 catalog queries the 16g high-water started OOMing late suites
// (first seen: PipelineOpsSpec aborting after CacheHygiene+PlanShape at
// 302 queries). Tests are not bench-timed, so the bigger heap is free.
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "28g")}"
