ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "procurementsystembigdataspark"
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
// Live-PostgreSQL integration (PostgresLiveSpec): the standard PUBLIC
// org.postgresql:postgresql:42.6.0 JDBC driver (Maven Central), on the
// TEST classpath only. In this zero-egress sandbox the artifact is not
// resolvable and its one on-disk copy ships inside the reference
// checkout's hive/lib — a vendor BINARY dependency, not reference code.
// Guarded on existence so the build stays green anywhere it is absent
// (the spec then cancels itself).
Test / unmanagedJars ++= {
  val pg = file("/root/reference/hive/lib/postgresql-42.6.0.jar")
  if (pg.exists) Seq(Attributed.blank(pg)) else Seq.empty
}
// Pass the forked run's output through UNPREFIXED: sbt's default logger
// wraps every stdout/stderr line in "[info] "/"[error] ", which is what
// kept the driver from parsing Bench's one-line JSON metric in rounds 1-3.
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
