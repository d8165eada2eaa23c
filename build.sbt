ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "beauty_lakehousespark"
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
// Pass the forked app's stdout through raw instead of re-logging each line
// with an "[info] " prefix: Bench's contract is ONE machine-parseable JSON
// line on stdout, and the logger prefix breaks the driver's parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress sbt's own trailing "[success] Total time: ..." line so the
// bench JSON stays the LAST line of stdout (the driver parses a bounded tail).
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
  // Throughput collector for the forked driver JVM: the bench/verify runs
  // are allocation-heavy batch work on local[32], where G1's concurrent
  // phases + write barriers tax every task thread. Measured on the 25-row
  // >=2.5 s bench tail (min-of-3, idle machine): G1 122.7 s / ParallelGC
  // 102.6 s at -Xmx8g (-16%); heap size itself was neutral (24g G1 123.1,
  // 24g PGC 109.1), so 8g stays. Local-JVM choice only — cluster executors
  // set their own GC via spark.executor.extraJavaOptions.
  "-XX:+UseParallelGC",
) ++
  // dev-loop GC experiments (e.g. SPARK_GRAFT_JVM_EXTRA="-XX:+UseParallelGC"):
  // empty by default — the shipped JVM config is exactly the flags above
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty)
