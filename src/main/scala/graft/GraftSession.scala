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
    * nanosAsLong: earlier driver-generated fixtures carried parquet
    * TIMESTAMP(NANOS) in events.ts, which Spark 4 refuses to read
    * natively; with the conf on we read that layout as long and
    * convert explicitly in [[table]]. Harmless for µs fixtures.
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
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts has shipped in two fixture layouts: TIMESTAMP(NANOS)
    // (read as long under nanosAsLong — integral ns→µs division keeps
    // precision above 2^53 ns) and plain timestamp[us] (read as NTZ).
    // Normalize both to session-TZ TimestampType (session TZ is UTC,
    // so the NTZ→LTZ cast is value-preserving) so every downstream
    // consumer — windows, watermarks, the java.sql.Timestamp Encoder
    // in streaming — sees one stable type.
    if (name == "events")
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _                => df
      }
    else df
  }

  /** Register every test table as a temp view so `spark.sql(qry)` works —
    * the faithful analog of the reference shipping the user's `qry` to
    * PG/Oracle (/root/reference/scribedb/base.py:39).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
