ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlportfolioprojectspark"
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
  // Fixed 16g heap (the box has 128 GiB, one forked JVM at a time):
  // local[32] churns through broadcast + codegen + shuffle buffers fast
  // enough that an 8g heap produced multi-second GC stalls mid-bench,
  // randomly inflating whichever query they landed on. Xms=Xmx avoids
  // timed heap-resize pauses.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// NOTE (builder workflow, not build config): never recompile while a
// backgrounded `sbt test` is running — the forked test JVM loads class
// files LAZILY from target/, so a concurrent compile swaps anonymous
// function classes under executing suites and produces impossible-
// looking failures (pattern matches counting nodes that aren't there,
// ClassCastExceptions between unrelated catalyst node types). Observed
// twice in round 14; both runs' failures vanish with no code change
// when the suite runs without concurrent compilation.
