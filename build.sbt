ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "acledspark"
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
// Bench-capture mode: the harness keeps only the tail of stdout and parses
// its LAST line as JSON, but sbt prints "[success] Total time: …" after the
// bench's summary line, so the parse always failed. When the bench env var
// is set (the only caller that sets it is a bench run), suppress the
// success trailer so Bench's summary JSON is the true last stdout line.
// Normal dev/test invocations (no env var) keep the trailer.
showSuccess := !sys.env.contains("SPARK_GRAFT_SF_DIR")
Global / excludeLintKeys += showSuccess
// …and sbt's logger prefixes every forked-stdout line with "[info] ",
// which breaks a parse of the last line as JSON. StdoutOutput passes the
// forked process's output through verbatim, so Bench's summary line
// reaches the capture exactly as printed.
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
  // local[32] runs driver AND all 32 task slots in this one JVM: 8g gave
  // each concurrent task ~250 MB and left long multi-query runs (Bench's
  // 200+ queries, Verify) paying heavy old-gen GC late in the run — the
  // r20 A/B read fatality_model at 38 s in-run under 8g vs 23 s under
  // 24g on the same tree (isolated it runs 15 s either way; the delta is
  // pure GC context). 24g ≈ 0.75 GB/core, the conventional executor
  // sizing floor; still parameterized for smaller hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
