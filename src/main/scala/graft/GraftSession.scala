package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers shared by Verify/Bench/tests.
  *
  * Scale notes: shuffle partitions default to the local core count
  * (the driver overrides via conf for cluster runs); AQE is on so
  * runtime coalescing / skew-join handles misestimates — this replaces
  * the reference's adaptive bucket-size calibration loop
  * (/root/reference/scribedb/base.py:108-154) with Spark-native
  * adaptivity.
  */
object GraftSession {

  /** Confs shared by every entry point (build/Verify/Bench).
    * nanosAsLong: the events table carries parquet TIMESTAMP(NANOS),
    * which Spark 4 refuses to read natively; we read it as long and
    * convert explicitly in [[table]].
    */
  val commonConfs: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.extensions" -> "graft.plans.GraftExtensions",
    "spark.ui.enabled" -> "false")

  def build(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    commonConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** All driver-generated test tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts arrives as long nanos (see commonConfs): convert to a
    // proper timestamp via integral ns→µs division (a double division
    // would lose precision above 2^53 ns).
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every test table as a temp view so `spark.sql(qry)` works —
    * the faithful analog of the reference shipping the user's `qry` to
    * PG/Oracle (/root/reference/scribedb/base.py:39).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
