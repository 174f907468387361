ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "metricsservicespark"
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
// Pass the forked program's stdout/stderr through verbatim: the driver
// parses Bench's one-line JSON metric from stdout, and sbt's default
// LoggedOutput strategy would prefix it with "[info] ", breaking a
// strict JSON-line parse (BENCH_r{1..3}.json all show parsed: null).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // the full bench sweep whole-stage-codegen-compiles ~75 queries in one
  // JVM; at the default 240m the code cache fills late in the sweep, C2
  // stops compiling, and the LAST entries run partially interpreted —
  // measured r12: the final three entries read 1.4x/2x/3.9x their
  // isolated medians, deflating to in-band once the cache was raised.
  // 512m STILL filled by position ~63 of the driver's 75-entry r12 sweep
  // (j_ra_linkpred 24.3 s official vs 6.0 s isolated — VERDICT r12 #1),
  // so: 1g reservation, and Bench now emits a {"metric":"codecache"}
  // telemetry line proving what the measuring JVM actually received.
  "-XX:ReservedCodeCacheSize=1g",
)
