ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nasa_asteroid_data_lakehousespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share/stop SparkSessions (ExtensionsInstallSpec needs a clean one);
// parallel suites in one JVM would race on the active session.
Test / parallelExecution := false
run / fork := true
// Bench/Verify print a machine-parsed JSON line; sbt's default LoggedOutput
// prefixes forked stdout with "[info] ", which broke the driver's parse of
// BENCH_r01.json. Pass the child's streams through untouched instead.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and sbt's trailing "[success] Total time: ..." line lands AFTER the
// JSON, so a parser reading the last stdout line still fails (BENCH_r02:
// "parsed": null). Suppress the success banner entirely.
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
  // 16g default (round-11): an in-suite pass-2 q213 OOM at 8g killed a
  // whole bench artifact — 32 local executor threads share this heap and
  // the machine has 128 GiB; 8g left no headroom for the wedge partial
  // aggregate on top of accrued broadcast blocks.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
