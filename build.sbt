ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkstreamingtestbedspark"
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
// Pass forked-run output through verbatim: the driver parses Bench's JSON
// line from stdout, and sbt's default logger prefixes every line with
// "[info] ", which breaks that parse (BENCH_r01.json "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Drop sbt's "[success] Total time: …" epilogue: it lands AFTER Bench's
// JSON line inside the driver's 2000-char stdout tail and shrinks the
// budget for the line itself (BENCH_r04.json "parsed": null).
Global / showSuccess := false
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
  // This host's memory subsystem stalls first-touch page faults 10-50×
  // in bursts (identical allocation bursts measured 0.3 s vs 87-266 s;
  // kernel time dominates). Counter-measures, all load-bearing:
  //  - ParallelGC with a FIXED young gen: eden reuses the SAME pages
  //    every cycle, so total faulted footprint = young + live set. (G1
  //    rotates eden across every committed region and kept faulting cold
  //    pages mid-run — 266 s stalls long after startup.)
  //  - Xms = Xmx: never uncommit + re-fault.
  //  - Bench/BenchProbe cycle the young gen before measuring
  //    (graft.HeapWarmup), absorbing the one-time faults.
  //  - hot paths allocate little (see functions/Hanoi.scala).
  //  - -XX:+AlwaysPreTouch is NOT an option: parallel GC-thread
  //    pre-fault drove kernel soft lockups and killed the fork.
  "-XX:+UseParallelGC", "-Xmn2g",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
)
