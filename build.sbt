ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scribedbspark"
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
// Pass the forked JVM's stdout through RAW. sbt's default LoggedOutput
// prefixes every line with "[info] ", which made the bench totals line
// unparseable for the driver (BENCH_r08 "parsed": null) — the artifact
// contract is "final stdout line is bare JSON".
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
  // 32 local executor threads share this one heap — 8g caused GC-bound
  // variance (up to 9x) on cache-heavy queries at sf0.1. Deliberately
  // NO -Xms pin by default: this sandbox provisions guest pages lazily
  // at ~1.5 GiB/s (measured) and charges first-touch at host pressure,
  // and an -Xms pin ALONE was measured to WORSEN tail latency — commit
  // without touch just moves the first-touch faults into whatever
  // query grows into the fresh pages first
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++
  // SPARK_GRAFT_PRETOUCH=1: -Xms=Xmx WITH AlwaysPreTouch — the pair
  // the earlier -Xms-only experiment lacked. Pre-touch faults every
  // heap page in at JVM STARTUP (~16 s at 24g), so mid-run heap
  // growth — the dominant canary-spike source in bench windows, which
  // lands exactly on the early allocation-heavy queries — never
  // provisions a guest page inside a timed rep. Opt-in because tests
  // and short dev runs should not pay the startup tax
  (if (sys.env.get("SPARK_GRAFT_PRETOUCH").contains("1"))
    Seq(s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
      "-XX:+AlwaysPreTouch")
  else Seq.empty) ++
  // diagnosis aid: SPARK_GC_LOG=/path enables unified GC logging in the
  // forked JVM (used to attribute rare slow bench reps to GC vs plan)
  sys.env.get("SPARK_GC_LOG").map(f => s"-Xlog:gc*:file=$f:time,uptime").toSeq
