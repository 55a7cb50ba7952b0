ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "opensetspark"
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
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the logger prefixes every line with "[info] ", which breaks any harness
// that parses the bench/verify JSON line from stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress sbt's own trailing "[success] Total time" line so the
// JSON line a harness tails for stays at the very end of the output.
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
// experiment hook: extra forked-JVM flags for A/B runs (e.g. GC choice)
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Explicit System.gc() calls (Spark's own ContextCleaner periodic GC and
  // the bench's between-query reap) run as CONCURRENT G1 cycles instead of
  // stop-the-world full collections: reference processing still happens
  // (which is all the reap needs — ContextCleaner cleans via weak refs),
  // but the 32-thread JVM no longer stalls for a full-heap compaction
  // per query. Interleaved A/B: ~20% on a GC-heavy 10-query subset.
  "-XX:+ExplicitGCInvokesConcurrent",
  // 16g default: local[32] runs driver+executors in ONE JVM, and a 95-query
  // sweep accumulates codegen classes, status-store entries, and hot-table
  // cache blocks on top of 32 threads of UDF allocation — at 8g the old
  // gen fills and allocation-heavy kernel queries eat multi-second GC
  // stalls late in the sweep (the machine has 128 GiB; a real cluster
  // sizes executor memory independently of this local-mode setting).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
