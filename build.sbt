ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pmpanalyticsspark"
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
// Forked run output passes through raw (no "[info] " prefix): the
// bench harness json-parses stdout lines, and a prefixed line is not
// valid JSON.
outputStrategy := Some(StdoutOutput)
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
  // 32g default (the JDK-17 default of RAM/4 on this 128GiB box,
  // pinned so it can't silently shrink): at local[32] the heavy dedup
  // queries' persisted stages plus 80+ back-to-back plans cause GC
  // outliers at smaller heaps — measured: q_dedup_minhash warm runs
  // 4.3s at 32g vs 7.8s at 16g, same code
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
// Bench-only (run, not test — tests shouldn't pay a 32g pre-fault at
// JVM startup): pin initial = max and pre-touch the pages. Bench
// forces a GC between queries, and an unpinned heap uncommits regions
// after each full GC — the next query then pays page re-commit inside
// its timed section; without pre-touch the first-touch faults of a
// pinned 32g heap land in the first allocation-heavy query instead
// (measured 16s q_dedup_minhash).
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:+AlwaysPreTouch",
)
// Measurement-harness passthrough (Tune/Bench forensics): extra JVM
// flags for the forked run JVM, e.g. GC logging or a G1 region-size
// sweep for the humongous-allocation adjudication —
//   SPARK_GRAFT_JVM_OPTS="-Xlog:gc*=info:file=/tmp/gc.log -XX:G1HeapRegionSize=8m"
run / javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
