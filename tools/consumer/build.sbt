// Minimal EXTERNAL consumer of the published graft artifact — the
// green_gate leg that proves a third-party build can DEPEND on the
// library (not just spark-submit its jar): `sbt publishLocal` in the
// repo root, then `sbt -batch run` here resolves timeseriesspark from
// the local ivy repository, compiles against its API, and drives two
// operators + PlanLint end to end.
scalaVersion := "2.13.17"
name := "graft-consumer"
// Spark is provided by the environment, exactly as on a cluster:
unmanagedBase := file("/opt/spark/jars")
libraryDependencies += "timeseriesspark" %% "timeseriesspark" % "0.1.0"
run / fork := true
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
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
  "-Xmx8g",
)
