ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "propensityspark"
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
// Driver-contract output hygiene (round 11): the bench/verify driver reads
// the LAST ~2000 chars of this process's stdout and tries to parse the one
// JSON line. Under sbt's default LoggedOutput the forked app's stdout is
// re-logged with an "[info] " prefix and the run ends with a
// "[success] Total time..." line — ten rounds of BENCH_rNN.json show
// `parsed: null` with the complete JSON line sitting in the tail behind
// that prefix. StdoutOutput passes the forked process's stdout through
// verbatim (stderr stays stderr), and showSuccess drops the trailing
// [success] line, so the bare JSON line is the last thing on stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by another setting —
// exclude it from the unused-key lint so the warning doesn't precede runs
Global / excludeLintKeys += showSuccess
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
  // 24g default: the wide feature plans (≈390-col aggregation state ×
  // 4 windows) plus the pinned bucketed silver are GC-bound under 8g at
  // sf0.1 — training_set alone swings 21s↔35s with heap pressure
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // the suite JIT-compiles many MiB of generated aggregate code; the
  // 240m default code cache fills after a warm-up pass + timed pass and
  // the JVM silently disables compilation for whatever runs last
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_GC").toSeq.flatMap(_.split("\\s+").toSeq)
