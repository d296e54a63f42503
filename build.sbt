ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ethoptionsdatapipelinespark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as the
// bench metric JSON. Two things defeated that for five rounds: sbt's logger
// prefixes forked stdout with "[info] ", and sbt prints a trailing
// "[success] Total time..." line after the fork exits. Route forked output
// straight through (no prefix) and suppress the success banner so the
// compact metric line printed by Bench is the literal final stdout line.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Dozens of whole-stage-codegen'd plans in one JVM overflow the default
  // 240m JIT code cache; once full the JIT disables itself and queries run
  // interpreted 10-30x slower. More compiler threads drain the compile
  // queue faster so late-session hot loops don't stay interpreted.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:CICompilerCount=12",
) ++ sys.env
  .get("SPARK_GRAFT_EXTRA_JVM")
  // dev knob for JIT-environment experiments (e.g.
  // SPARK_GRAFT_EXTRA_JVM=-XX:TieredStopAtLevel=1 to simulate
  // C2-compile starvation); empty in every driver invocation
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty))
  .getOrElse(Seq.empty)
