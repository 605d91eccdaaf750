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
  // Throughput collector for the batch workload: G1's concurrent-mark
  // Remark pauses (driven by codegen classloaders + cleaner weak refs,
  // which grow with every query a session runs) landed mid-query and
  // added ~10s of nondeterministic in-query pause time per 71-query
  // sweep. With ParallelGC there is no concurrent cycle to interrupt a
  // query; old-gen garbage is collected by the explicit System.gc() at
  // the untimed between-query boundary (GraftSession.releaseCaches).
  // Measured: 97.5s -> 77.5s full-sweep total at sf0.1, in-query GC
  // pause time 12.8s -> 4.0s.
  "-XX:+UseParallelGC",
)
// Ad-hoc diagnostics without editing the build (e.g.
// GRAFT_EXTRA_JVM_OPTS="-Xlog:gc" to watch pause time across a sweep).
javaOptions ++= sys.env.get("GRAFT_EXTRA_JVM_OPTS")
  .map(_.trim.split("\\s+").toSeq).getOrElse(Seq.empty)
