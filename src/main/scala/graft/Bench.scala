package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness — one JSON line per run, consumed by the driver.
  *
  * Noise robustness (the artifact is a grading signal, so it must not
  * lie):
  *
  *   - Each query runs one UNTIMED warm rep, then
  *     `SPARK_GRAFT_BENCH_REPS` timed reps (default 3) and reports the
  *     MEDIAN; per-rep times are emitted in `reps_detail` so an
  *     outlier rep is visible in the artifact instead of silently
  *     shaping the median. The warm rep absorbs per-query one-time
  *     cost (plan analysis, codegen, view registration) that is not
  *     the steady-state signal.
  *   - `System.gc()` runs once per query BEFORE the warm rep — never
  *     between timed reps: an explicit full GC on a large heap runs
  *     concurrently into the next timed window and was measured
  *     polluting whole-query medians (r4's q20 3.4 s vs 0.9 s warm).
  *     Between reps only session caches are dropped: table/plan caches
  *     via `clearCache()` plus explicit RDD-level persists
  *     (localCheckpoint blocks from connectedComponents and comparator
  *     report caches are invisible to the catalog).
  *   - Failures are never swallowed into a fake wall time: a failed
  *     rep records its exception in `errors` and the REMAINING reps
  *     still run (a transient failure costs one rep, not the query's
  *     whole timing signal); the median is over the successful reps.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
    GraftSession.commonConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // drop session-retained state a query may have left behind
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // warm the JVM/codegen/scan paths so the first query's warm rep
    // doesn't absorb ~10s of one-time cost. The comparator warm-up
    // mirrors the real cmp_* plan family EXACTLY (same schema, same
    // mutated lineage, same bucket count) so janino's codegen cache
    // hits on the timed runs.
    val warmLi = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(50000)
    warmLi.groupBy("l_returnflag").count().count()
    graft.diff.Comparator.compare(
      warmLi, graft.queries.CompareQueries.mutated(warmLi),
      graft.diff.CompareOptions(numBuckets = 512))
    dropCaches()

    def jsonSafe(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\r\\n\\t]", " ").take(300)

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val repDetail = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val results = SparkEntry.queries.map { case (name, fn) =>
      // settle the session once per query, outside any timed window
      System.gc()
      def runOnce(): Either[String, Double] = {
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch {
            case e: Throwable =>
              Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
          }
        dropCaches()
        r
      }
      runOnce().left.foreach(m => errors(name) = s"warmup: $m") // untimed warm rep
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        runOnce() match {
          case Right(t) => times += t
          case Left(m)  => if (!errors.contains(name)) errors(name) = m
        }
      }
      repDetail(name) = times.toSeq
      val median =
        if (times.isEmpty) -1.0
        else { val s = times.sorted; s(s.length / 2) }
      name -> median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"\"" + k + "\":\"" + jsonSafe(v) + "\"" }
      .mkString("{", ",", "}")
    val rd = repDetail.map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"errors":$es,"reps_detail":$rd,"sf":"$sfDir"}""")
    spark.stop()
  }
}
