ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hivetaskspark"
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
// Inherit stdout in forked `run` instead of routing through sbt's logger:
// the logger prefixes every line with "[info] ", which breaks any consumer
// that json-parses Bench's stdout line (a bare `{"metric":...}` line parses;
// `[info] {"metric":...}` does not). 9 of 10 driver rounds failed to parse
// the bench line for exactly this reason.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 70+ codegen-heavy queries in one JVM overflow the default 240m JIT
  // code cache; once full, hot generated code runs interpreted (measured
  // 3-10x slowdowns on queries late in the Bench run).
  "-XX:ReservedCodeCacheSize=1g",
)

// CatalogSpec needs a Hive-enabled session; spark.sql.catalogImplementation
// is a static conf, so it runs in its own forked JVM, apart from the shared
// in-memory-catalog test session.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  tests.groupBy(t =>
    if (t.name.endsWith("CatalogSpec")) "hive"
    else if (t.name.endsWith("ExtensionsSpec")) "ext" // needs a virgin JVM:
    // withExtensions only applies when the builder CREATES the session
    else "main")
    .map { case (g, ts) => Tests.Group(g, ts, Tests.SubProcess(opts)) }.toSeq
}
