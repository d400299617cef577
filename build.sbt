ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusionorcextensionspark"
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
// local-cluster[N,cores,mem] (real executor JVMs — the N-vs-4N-executors
// scaling evidence) needs these to spawn executors from /opt/spark:
run / envVars ++= Map("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13")
Test / envVars ++= Map("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13")
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
// ad-hoc JVM flags for experiments (e.g. GC logging/collector swaps)
javaOptions ++= sys.env.get("SPARK_EXTRA_JAVA_OPTS")
  .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Entry-local temp TABLE dirs (Files.createTempDirectory) follow the
  // same stance as spark.local.dir (EncodeBench.session): in this
  // single-node sandbox every thread shares one virtual disk, which fakes
  // an IO ceiling (and IO noise) a multi-node cluster doesn't have —
  // round-6 telemetry showed the encode entries' wall time tracking disk
  // noise through their /tmp table writes. 126 GiB tmpfs >> the MB-scale
  // per-entry tables, and every entry deletes its dir in a finally.
  s"-Djava.io.tmpdir=${sys.env.getOrElse("SPARK_GRAFT_TMPDIR",
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
    else System.getProperty("java.io.tmpdir"))}",
)
