ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "trckspark"
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
// Cluster packaging: `sbt assembly` builds the spark-submit deployable.
// Every runtime dependency here IS the Spark distribution (unmanagedBase
// points at /opt/spark/jars — all `provided` in assembly terms; scalatest/
// scalacheck are Test-only), so the deployable equals the module jar:
// there is nothing to shade or merge, and pulling the sbt-assembly plugin
// (unresolvable offline anyway) would add machinery to produce the same
// bytes. If the library ever grows a non-provided dependency, switch this
// task to sbt-assembly and shade here. Verified usage: docs/COOKBOOK.md §0.
lazy val assembly = taskKey[File]("Build the spark-submit deployable jar")
assembly := {
  val src = (Compile / packageBin).value
  val out = target.value / s"${name.value}-assembly-${version.value}.jar"
  IO.copyFile(src, out)
  streams.value.log.info(s"assembly -> $out")
  out
}
