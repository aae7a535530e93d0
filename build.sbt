ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "newsagencyclassificationspark"
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
  sys.env.getOrElse("GRAFT_GC", "-XX:+UseG1GC"),
  // JDK<21 GCLocker starvation: compression codecs' JNI critical
  // sections (lz4 on every shuffle/checkpoint block) can make an
  // allocation of literally 3 words throw a spurious OutOfMemoryError
  // ("Retried waiting for GCLocker too often") once enough threads
  // hammer the codec — observed killing the 32-thread 20M-edge CC
  // bench leg at <2 GB of real occupancy while the 8-thread leg sailed
  // through. The pre-JDK-21 mitigation is
  //   GRAFT_JVM_EXTRA="-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100"
  // — env-gated rather than default because the flag itself measured
  // +6-12% wall on the sf0.1 bench mix in an interleaved A/B (BENCH.md
  // round 7), a price only the high-thread iterative ladders need to
  // pay; JDK 21's region pinning removes the issue outright.
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
javaOptions ++= sys.env.get("GRAFT_JVM_EXTRA").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
