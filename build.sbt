ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wallyspark"
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
// Forked run output goes RAW to sbt's own stdout/stderr instead of
// through sbt's logger: the logger prefixes every line with "[info] ",
// so Bench's one-line JSON contract never started with '{' and the
// driver's parse failed in ALL seventeen rounds (BENCH_r01 proves it:
// the full line fit the capture and still read parsed:null — the
// prefix, not truncation, was the blocker). StdoutOutput also routes
// the fork's stderr (Spark WARN spam) to real stderr instead of
// "[error]"-prefixed lines on stdout, keeping the captured stdout tail
// clean for the JSON line.
run / outputStrategy := Some(StdoutOutput)
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
  // 8g OOMed once the suite passed ~180 tests (the registry-wide sweeps
  // run every query in one JVM); the host has 125 GiB — size for the
  // suite we have, overridable via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
