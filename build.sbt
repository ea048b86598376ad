ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "facebookprestospark"
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
// The driver parses graft.Bench's one-line JSON summary from stdout.
// sbt's default LoggedOutput relogs every forked line with an
// "[info] " prefix, which is not valid JSON — inherit the parent's
// stdout instead so the line lands raw (BENCH_r* `parsed` was null
// through round 9 because of the prefix).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Heap sizing, measured at sf0.1 on the 32-core/128 GiB box: 8g made
  // unified memory evict the shared caches (partsupp, shingles) under
  // 32-task fan-out joins (queries after the llm group recomputed them,
  // 3-8x slower); 64g made G1 young-gen pauses multi-second (5.2 s max,
  // 34% of wall in STW on the shape/setop group). 16g + an explicit
  // pause target keeps both failure modes out.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:MaxGCPauseMillis=300",
  // A ~200-query suite generates hundreds of whole-stage-codegen classes;
  // the 240m default code cache fills late in the run, the JIT disables
  // itself, and compute-dense kernels (LSH verify joins) fall back to the
  // interpreter — measured ~13x CPU on llm_dedup_groups_lsh in full-suite
  // context vs isolated. 1g keeps every kernel compiled end-to-end.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc*:file=$f").toSeq ++ Seq(
)
