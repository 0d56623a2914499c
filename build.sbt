ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "shredderspark"
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
// Driver bench-headline contract (r22): the round driver JSON-parses the
// LAST line of the bench's stdout tail, and for 21 rounds every BENCH
// record came back `parsed: null` because sbt (a) logged the forked
// process's stdout through its logger — prefixing the headline with
// "[info] " — and (b) appended its own "[success] Total time ..." line
// AFTER it. StdoutOutput passes the forked JVM's stdout through raw
// (no prefix); showSuccess := false drops the trailing [success] line,
// so the headline JSON is the final unprefixed stdout line.
run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The r13 bench record lost a task to "Retried waiting for GCLocker
  // too often allocating 8388608 words" (a 64 MiB allocation failing
  // while a JNI critical section held the GCLocker, retried only
  // GCLockerRetryAllocationCount=2 times — the JDK-8192647 failure
  // class, removed entirely in JDK 21 by retiring GCLocker-induced
  // allocation stalls). 32 retries makes the transient critical-section
  // window survivable instead of failing the task; correct runs are
  // unaffected (the flag only changes the give-up threshold).
  "-XX:+UnlockDiagnosticVMOptions", "-XX:GCLockerRetryAllocationCount=32",
)
