ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "peinwdafdataingestionspark"
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
// The driver parses the LAST 2000 bytes of `sbt runMain graft.Bench` output
// for a one-line JSON report. sbt's default LoggedOutput strategy prefixes
// every forked-process line with "[info] " / "[error] ", which breaks a
// line-starts-with-'{' JSON parse (BENCH_r08: line fully inside the tail
// window, still "parsed": null). StdoutOutput passes the child's
// stdout/stderr straight through, unprefixed.
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
  "-Dspark.sql.ansi.enabled=false",
  "-Dspark.sql.legacy.sizeOfNull=false",
  // events.parquet uses INT64 TIMESTAMP(NANOS), unreadable by Spark 4 as a
  // timestamp — read as LongType (nanos since epoch).
  "-Dspark.sql.legacy.parquet.nanosAsLong=true",
  // InferFiltersFromGenerate + cost-blind predicate pushdown re-runs whole
  // per-row pipelines inside scan filters below explodes (see Bench.scala).
  "-Dspark.sql.optimizer.excludedRules=org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
  // Engine Catalyst extensions (native simhash64 expression).
  "-Dspark.sql.extensions=graft.plans.GraftExtensions",
  // local[32] on a 128 GiB box: 8g starved the round-1 bench (GC death
  // spiral + aborted stage on the LSH self-join); 32g leaves headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
