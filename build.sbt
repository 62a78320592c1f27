ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duckdbvortexspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"` as
// compact JSON. Two sbt behaviors have broken that for eight rounds:
// (a) forked-run output routed through the sbt logger gains an "[info] "
// prefix — StdoutOutput bypasses the logger entirely; (b) sbt prints a
// "[success] Total time: …" epilogue AFTER the program's output —
// showSuccess := false suppresses it.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // The host enforces a sustained-CPU ceiling of ~12 busy threads
  // (measured: a 16-thread spin collapses ~70x after a ~25 s burst
  // window; <=12 threads run steady indefinitely). Uncapped, G1's 23
  // GC workers + 12 JIT compiler threads push any Spark run over the
  // cliff. Bound the auxiliary pools so executor threads own the
  // budget.
  "-XX:ParallelGCThreads=2",
  "-XX:ConcGCThreads=1",
  "-XX:CICompilerCount=2",
)
