ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// The driver parses the LAST stdout line of `runMain graft.Bench` as
// JSON; sbt's "[success] Total time..." trailer printed after main
// returns broke that parse three rounds running ("parsed": null).
Global / showSuccess := false
// Forked `run`/`runMain` output normally passes through sbt's logger,
// which prefixes every line with "[info] " — that prefix is what kept
// the bench JSON unparsable even after showSuccess was disabled. The
// round-6 fix scoped this to `run / outputStrategy` only, but the
// driver invokes `runMain graft.Bench`, and in sbt's scope delegation
// the `runMain` task does NOT fall back to `run`-task-scoped keys — so
// the JSON still went through the logger ("parsed": null six rounds
// running). Set it at project level (no task axis), which every task
// delegates to, and pin the task-scoped keys too for belt and braces.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
name := "exhiventspark"
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
  // 16g default: the bench runs 70+ queries (several with eagerly
  // persisted intermediates) in one driver JVM; 8g left it digesting GC
  // debt between queries (round-3 verdict, What's wrong #1)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
