ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sequencing_integration_pipeline10spark"
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
// Heap: fixed-size (-Xms == -Xmx) and pre-touched, so the page-fault cost
// of growing a multi-GB heap is paid ONCE at JVM start instead of inside
// whatever query happens to trigger expansion — GC logs on the bench VM
// showed 2-3.7 SECOND "young" pauses during early heap growth (lazy page
// faulting on an overcommitted host), inflating first-pass measurements
// 3-8x. ParallelGC over G1: pure-batch workload, no latency SLO — sweep
// total dropped 34.9 -> 28.9 s in the A/B (see README round-10 row).
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseParallelGC",
) ++
  // Extra JVM flags for A/B experiments (GC choice, heap shape) without
  // editing the build: SPARK_DRIVER_XOPTS="-XX:+UseParallelGC ..."
  sys.env.get("SPARK_DRIVER_XOPTS").map(_.trim.split("\\s+").toSeq).getOrElse(Nil)
// The TEST fork keeps a modest, lazily-grown heap: the 41-suite run fits
// comfortably in 8g on local[4], and a fixed pre-touched 16g would refuse
// to start on a 16 GB laptop or an 8 GB CI container — measurement
// stability (the reason for the fixed heap above) matters for Bench, not
// for assertions. Same GC so tests exercise the production collector.
Test / javaOptions := jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "8g")}",
  "-XX:+UseParallelGC",
) ++
  sys.env.get("SPARK_DRIVER_XOPTS").map(_.trim.split("\\s+").toSeq).getOrElse(Nil)
