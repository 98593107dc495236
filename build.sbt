ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "albedospark"
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
// r18 (VERDICT r17 "Next round" #2): the suite ran 78 suites
// sequentially in ONE forked JVM (~7.5 min wall), which tripped the
// driver's test budget (VERIFY_r17 tests_ok:false was a timeout, not a
// failure). Shard suites round-robin across N forked JVMs running in
// parallel — each gets its own SparkSession, so no shared-session
// races; the publish paths are already concurrent-safe (crash-safe
// atomic publish, r17). N=4 at 4 local cores each = 16 of 32 cores.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val shards = sys.env.getOrElse("SPARK_GRAFT_TEST_SHARDS", "4").toInt
  tests.sortBy(_.name).zipWithIndex.groupBy(_._2 % shards).toSeq
    .sortBy(_._1).map { case (i, ts) =>
      Tests.Group(s"shard$i", ts.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
// REPLACE the default restriction set: the default contains
// ForkedTestGroup->1 and `+=` cannot relax an existing limit (the
// strictest tag wins), which would leave the shards sequential and
// merely add 3 extra JVM startups.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(8), Tags.limit(Tags.ForkedTestGroup, 4))
// Pass the forked process's stdout/stderr through verbatim instead of
// re-logging each line with an [info]/[error] prefix — the bench/verify
// drivers parse a bare JSON line from stdout (BENCH_r01 "parsed":null
// was exactly this prefix).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
