ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "receiptanalyzerpipelinespark"
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
// Forked run output goes through sbt's logger by default, prefixing every
// stdout line with "[info] " — which breaks machine parsing of Bench's
// single JSON metric line (the harness json-parses stdout lines; a
// prefixed line never parses). StdoutOutput passes the child's
// stdout/stderr through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and the trailing "[success] Total time ..." banner would land AFTER
// the metric line inside the harness's ~2000-char stdout tail window,
// eating ~75 chars of a budget the 77-query metric line nearly fills.
// With it off, the metric line is the last stdout line.
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 50+ codegen-heavy queries in one session generate enough classes to
  // fill the default ~240m JIT code cache, after which compilation stops
  // and expression-heavy plans fall back to the interpreter (observed:
  // 10-15x slowdowns late in a full Bench run). Headroom + flushing.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
