ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cassafortemetertransmissiongenspark"
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
// Forked-run output goes straight to this process's stdout/stderr instead
// of through sbt's logger — without this every line gets an `[info] `
// prefix, which made the driver's JSON parse of the Bench stdout line fail
// ("parsed": null in BENCH_r1–r5).
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
  "-Dspark.sql.session.timeZone=UTC",
  // 32g default on the 128 GiB box (was 8g). The 202-query bench runs
  // local[32] in THIS forked JVM: at 8g the whole session — shuffle
  // buffers, localCheckpoint blocks, broadcast vars, AND the
  // soft-referenced compiled-codegen-class cache — competes for one
  // small heap, so the collector reclaims the soft refs first and
  // many-stage queries silently re-pay janino compilation mid-session
  // (the round-14 in-bench-only inflation shape on d22/q71/d31;
  // bench.json's queries_codegen/queries_gc_ms deltas now measure it).
  // -Xmx is a ceiling, not a commitment: tests and small runs are
  // unaffected.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Code cache sized to the query surface (round 19, same shape as the
  // round-14 heap bump): the 233-query bench JVM peaks at ~198 MB of
  // compiled nmethods against the JDK-17 default 240 MB ceiling —
  // inside UseCodeCacheFlushing's eviction zone, so cold generated
  // classes get flushed and re-JIT'd mid-session (the bench's
  // queries_jit_ms telemetry shows 2–3 s of compiler time per rep on
  // the chain gates even in steady state). Headroom makes flushing a
  // non-event; unused reservation costs address space, not RSS.
  "-XX:ReservedCodeCacheSize=512m",
)
