ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projet_big_data_boutin_danrespark"
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
// The per-round bench artifact is parsed from the LAST stdout line of
// `sbt "runMain graft.Bench"`; sbt's own `[success] Total time: …`
// trailer printed after the forked JVM exits was shadowing the compact
// summary line every round (BENCH_r07–r09 all recorded "parsed": null).
// Suppress the trailer globally — nothing in the gate or the driver
// keys on it (errors still surface via exit code and [error] lines).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// …and pass the forked runMain's stdout through UNPREFIXED (no "[info] "
// logger decoration): the compact bench summary must be parseable as the
// raw final line, not as a log-framed one. (Verify's gate tag "[verify]"
// is printed by Verify itself on stderr, so the gate grep is unaffected.)
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
  // local mode = driver-only JVM; the box has 128 GiB, leave headroom for
  // sbt + the DuckDB oracle process
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
