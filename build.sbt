ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "qucosafcreporeportingdbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
  // Real-driver integration tests for the JDBC sinks (the reference's
  // only integration suite runs against live PostgreSQL; DuckDB speaks
  // the same ON CONFLICT / IS NOT DISTINCT FROM dialect and resolves
  // from the pre-warmed offline cache). Test-only — the engine itself
  // depends on java.sql alone.
  "org.duckdb" % "duckdb_jdbc" % "1.0.0" % Test,
)
Test / fork := true
run / fork := true
// The driver captures `sbt "runMain graft.Bench"` stdout and JSON-parses the
// LITERAL last line. Two pieces of sbt chrome have kept that parse at
// "parsed": null for 11 rounds: the "[info] " prefix sbt's logger adds to
// forked-process output, and the trailing "[success] Total time: ..." line.
// StdoutOutput passes the forked JVM's stdout through raw (no log prefix);
// showSuccess drops the success trailer — so the last captured line is
// exactly Bench's {"metric":"total",...} JSON.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
