ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datapipelinersnaspark"
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
// The container's POSIX locale makes the JVM's filename encoding
// (sun.jnu.encoding, fixed natively at JVM start from the locale)
// ASCII-only, so any non-ASCII FILENAME — e.g. a unicode value in a
// Hive-style partition directory name — throws InvalidPathException at
// write (a -Dsun.jnu.encoding override is ignored by the JNI layer).
// Production clusters run UTF-8 locales; give the forked JVMs the same
// (found by the q49 adversarial partition tranche).
Test / envVars += "LC_ALL" -> "C.utf8"
run / envVars += "LC_ALL" -> "C.utf8"
// Forked run output defaults to LoggedOutput, which prefixes every stdout
// line with "[info] " — that breaks line-oriented JSON parsing of the
// Bench/Verify output downstream. StdoutOutput passes the child's stdout
// through verbatim.
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
  "-Dfile.encoding=UTF-8",
  // 72 bench queries incl. cached pixel pipelines need headroom; the
  // machine has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
