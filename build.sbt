ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetprocessorspark"
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
// The host locale is POSIX, which makes the JVM's filesystem-path
// encoder (sun.jnu.encoding) ASCII-only — staging a UTF-8-named file
// throws InvalidPathException. Tests exercise multibyte archive
// member names (the tar fuzz property), so force a UTF-8 locale in
// the forked test JVM; production surfaces are left as the host sets
// them (parquet/JSON paths in the driver contract are ASCII).
Test / envVars += ("LC_ALL" -> "C.UTF-8")
// The forked program's stdout goes straight through, NOT via the sbt
// logger: the logger prefixes every line with "[info] ", which breaks
// any consumer that json-parses the program's output lines (the bench
// protocol emits one JSON line on stdout; five rounds of driver
// captures show it arriving as "[info] {...}" and failing to parse).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and no "[success] Total time:" banner AFTER the program's final
// line, so the last stdout line IS the program's last line.
showSuccess := false
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
  // 16g: the 20x-replica scale probes run 32 concurrent tasks in one JVM;
  // 8g left the unified pool ~140 MB/task and an OOM margin measured too
  // thin once two cap stages stack (round-6 bench transient)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
