ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "creatoropslakehousespark"
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
// Forked run output bypasses sbt's logger so runMain mains (Bench/Verify)
// print raw lines to stdout without the "[info] " framing — the driver
// parses the bench summary JSON from the tail of captured stdout.
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
  "-Xlog:gc:file=/tmp/gc_%p.log",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // dozens of whole-stage-codegen classes per query × 40+ queries overflow
  // the default 240m JIT code cache → multi-minute interpreter-only phases
  "-XX:ReservedCodeCacheSize=2g",
  // 40+ distinct query plans deopt shared parser/codec methods repeatedly;
  // once a method crosses the recompilation cutoff HotSpot blacklists it to
  // interpreter-only, observed as 10-30x stalls on whatever query touches it
  // next. Unlimited recompilation trades a little compile churn for that.
  "-XX:PerMethodRecompilationCutoff=-1",
  "-XX:PerBytecodeRecompilationCutoff=-1",
  "-XX:CICompilerCount=18",
)
