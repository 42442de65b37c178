package graft.diff

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted dataset fingerprints: compare a live dataset against a
  * stored snapshot WITHOUT rescanning the snapshot — at 100 TB the
  * stored side costs O(numBuckets) rows to read regardless of the
  * original data size. This generalizes the reference's transient
  * in-database hashes (recomputed per run,
  * /root/reference/scribedb/base.py:156-159) into a durable artifact:
  * nightly-snapshot drift detection reads yesterday's fingerprints,
  * never yesterday's data.
  *
  * The store records numBuckets; compare validates it so fingerprints
  * from different bucketings can't be silently cross-compared.
  */
object FingerprintStore {

  def write(df: DataFrame, numBuckets: Int, path: String): Unit =
    Comparator.fingerprints(Comparator.withBuckets(df, numBuckets))
      .withColumn("num_buckets", lit(numBuckets))
      .write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): (DataFrame, Int) = {
    val df = spark.read.parquet(path)
    val nb = df.select("num_buckets").head().getInt(0)
    (df.drop("num_buckets"), nb)
  }

  /** (mismatchedBuckets, storedRowCount, liveRowCount). */
  def compareWithStored(df: DataFrame, path: String): (Long, Long, Long) = {
    val (stored, nb) = read(df.sparkSession, path)
    val live = Comparator.fingerprints(Comparator.withBuckets(df, nb))
    val j = stored
      .withColumnRenamed("cnt", "s_cnt").withColumnRenamed("hsum", "s_hsum")
      .withColumnRenamed("h2sum", "s_h2sum")
      .join(live.withColumnRenamed("cnt", "l_cnt").withColumnRenamed("hsum", "l_hsum")
        .withColumnRenamed("h2sum", "l_h2sum"), Seq("__bucket"), "full_outer")
    val r = j.agg(
      sum(when(
        !(coalesce(col("s_cnt"), lit(0L)) === coalesce(col("l_cnt"), lit(0L))) ||
        !(coalesce(col("s_hsum"), lit(0)) <=> coalesce(col("l_hsum"), lit(0))) ||
        !(coalesce(col("s_h2sum"), lit(0)) <=> coalesce(col("l_h2sum"), lit(0))), 1L)
        .otherwise(0L)).as("bad"),
      coalesce(sum("s_cnt"), lit(0L)),
      coalesce(sum("l_cnt"), lit(0L))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }
}
