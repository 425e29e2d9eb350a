ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lakesatelliteimageetlspark"
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
// Per-test durations in the ScalaTest report (what the budget split
// below is tuned against).
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// Long soak-style tests (multi-wave streaming admissions, decade
// ladders) are tagged graft.Slow and EXCLUDED from the default
// `sbt test` target so the default suite fits the driver's test
// budget (r18 verdict ask #7 — the r18 run took 23m44s and the
// driver's capture died mid-suite). Run the full set with
// `GRAFT_RUN_SLOW=1 sbt test`, or only the slow set with
// `sbt "testOnly * -- -n graft.Slow"`.
Test / testOptions ++= (
  if (sys.env.contains("GRAFT_RUN_SLOW")) Seq.empty[Tests.Argument]
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Slow")))
// Pass the forked JVM's stdout through verbatim instead of logging it
// with an `[info] ` prefix: the driver parses Bench's single JSON
// stdout line, and the prefix broke that parse (BENCH_r02 "parsed":
// null). Stderr (Spark logs) keeps flowing to the sbt logger.
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
)
