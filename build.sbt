ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gpdbspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- r10: parallel forked test groups --------------------------------
// The 6 suites ran SEQUENTIALLY in one forked JVM: 24m45s wall at ~1.2
// cores average utilization — latency-bound, not CPU-bound (and past the
// driver gate's wall window, which killed the r9 sbt-test run mid-suite).
// Fork THREE JVMs of balanced wall cost and run them concurrently.
// Isolation notes: each group is a separate process with its own
// SparkSession, and gets its own java.io.tmpdir — query fixtures write to
// fixed ${java.io.tmpdir}/graft_<name> paths, so two groups running the
// same query (GoldenSpec vs QueriesSmokeSpec) must not share a tmpdir.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val base = (Test / javaOptions).value
  val groupOf = Map(
    "graft.GoldenSpec" -> "g1",        // ~11 min: all queries, hashed
    "graft.QueriesSmokeSpec" -> "g2",  // ~5.5 min: all queries, counted
    "graft.PlanSpec" -> "g2",          // ~1 min
    "graft.PropertySpec" -> "g2",      // seconds
    "graft.ExpressionSpec" -> "g3",    // ~4 min
    "graft.OperatorSpec" -> "g3",      // ~3 min
  )
  tests.groupBy(t => groupOf.getOrElse(t.name, "g3")).map { case (g, ts) =>
    val tmpdir = s"/tmp/graft-test-$g"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmpdir))
    Tests.Group(g, ts, Tests.SubProcess(ForkOptions().withRunJVMOptions(
      (base ++ Seq(
        s"-Djava.io.tmpdir=$tmpdir",
        // three concurrent JVMs each defaulting GC threads to the full
        // 32-core box thrash in system time (measured: 55 min sys);
        // size GC to each group's actual local[8] share
        "-XX:ParallelGCThreads=6", "-XX:ConcGCThreads=2")).toVector)))
  }.toSeq
}
// allow the three forked groups to actually run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 3), Tags.limitAll(6))
