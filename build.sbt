ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "leader_graphspark"
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
// The bench/verify contract is "print ONE parseable JSON line": with the
// default LoggedOutput strategy sbt re-tags the forked JVM's stdout as
// "[info] {...}" and stderr as "[error] ...", so a line-oriented JSON
// parser over the captured stdout never matches (ten rounds of
// BENCH_r*.json "parsed": null). StdoutOutput passes the forked process's
// stdout/stderr through verbatim; showSuccess drops the trailing
// "[success] Total time ..." footer so the compact JSON summary printed
// by graft.Bench is literally the last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the command loop, not a task — exempt it from
// the unused-key lint.
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
  // local[32] runs 32 concurrent tasks in one JVM: unified memory must
  // hold 32 partial-aggregate buffers at once (g4's packed-array
  // aggregation is allocation-heavy). 16g balances headroom against G1
  // pause cost — 8g spilled under the fat-array load, 48g lengthened GC
  // cycles measurably. On a real cluster this is per-executor sizing.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Collector choice is HEAP-GATED, both ways measured:
  //  - Small heaps (sf<=1 sweeps, 16g default): ParallelGC. G1's
  //    concurrent-mark Remark pauses (codegen classloaders + cleaner
  //    weak refs, growing per query) landed mid-query and added ~10s
  //    nondeterministic pause per 71-query sf0.1 sweep; ParallelGC has
  //    no concurrent cycle, and old-gen garbage goes to the explicit
  //    System.gc() at the untimed between-query boundary
  //    (GraftSession.releaseCaches). Measured: 97.5s -> 77.5s
  //    full-sweep at sf0.1, in-query GC pause 12.8s -> 4.0s.
  //  - Big heaps (the 64g sf10 runs): G1. ParallelGC's stop-the-world
  //    young scans over a ~50G live heap ate the wall on the
  //    shuffle-quadratic keys — g19 at sf10 measured 311.9s with
  //    153.3s (49%) total GC pause incl. a 51.9s max and 32 Full GCs;
  //    the identical run under G1 read 236.4s with 9.6s total pause,
  //    max 1.4s (both windows steal ~0.2%). This is also the r15->r16
  //    "sf10 g19/d15 anomaly" mechanism: heap-shape-sensitive
  //    ParallelGC pause storms, not code.
  //    Tuning on the G1 arm (g6 probe, r16): pre-size the heap
  //    (-Xms=-Xmx — expansion churn under allocation bursts) and pin
  //    region size to the 32m max (halves the humongous threshold's
  //    bite on the big-array kernels: packed-long ranks, roaring
  //    bitmaps, wedge hash maps). g6's G1 GC pause total fell to 21s
  //    tuned vs ParallelGC's 277s 3-key storm in the adjacent window.
  //    Collector preference is KEY-DEPENDENT at 64g (g19/d15 strongly
  //    G1, g6/g13 lean ParallelGC) — the gate picks the arm that
  //    removes the catastrophic failure mode (50-80s pause storms +
  //    heartbeat suicide); per-run override via GRAFT_EXTRA_JVM_OPTS
  //    ("-XX:-UseG1GC -XX:+UseParallelGC") stays available.
  if (sys.env.get("SPARK_DRIVER_MEM")
      .flatMap(m => scala.util.Try(m.toLowerCase.stripSuffix("g").toInt).toOption)
      .exists(_ >= 32)) "-XX:+UseG1GC"
  else "-XX:+UseParallelGC",
) ++ (if (sys.env.get("SPARK_DRIVER_MEM")
        .flatMap(m => scala.util.Try(m.toLowerCase.stripSuffix("g").toInt).toOption)
        .exists(_ >= 32))
        Seq(s"-Xms${sys.env("SPARK_DRIVER_MEM")}", "-XX:G1HeapRegionSize=32m")
      else Seq.empty)
// Ad-hoc diagnostics without editing the build (e.g.
// GRAFT_EXTRA_JVM_OPTS="-Xlog:gc" to watch pause time across a sweep).
javaOptions ++= sys.env.get("GRAFT_EXTRA_JVM_OPTS")
  .map(_.trim.split("\\s+").toSeq).getOrElse(Seq.empty)
