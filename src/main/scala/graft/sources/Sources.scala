package graft.sources

import graft.config.{SideSpec, SourceSpec}
import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Source resolution: SideSpec → DataFrame.
  *
  * Connector notes (O1–O3):
  *   - JDBC ships the user's whole `qry` to the remote database via the
  *     `query` option, so filters/joins/projections in it execute
  *     remotely — exactly the reference's pushdown posture
  *     (/root/reference/scribedb/base.py:39 executes qry in PG/Oracle).
  *     Unlike the reference there is no client-library dance
  *     (/root/reference/scribedb/oracle.py:130 init_oracle_client): the
  *     JDBC driver jar on the executor classpath is all that's needed.
  *   - With `partition_column`/`num_partitions` configured, the read is
  *     RANGE-PARTITIONED: Spark opens numPartitions concurrent
  *     connections, each scanning one stride of `(qry)` — the scale
  *     path the reference lacks (its cursor streams the whole result
  *     through one connection, /root/reference/scribedb/base.py:58-69).
  *     Bounds not given in the config are derived by a pushed-down
  *     `SELECT MIN/MAX` over the subquery — one scalar row over the
  *     wire, never a full scan.
  *   - Secrets come from env vars (`password_env`), never the config
  *     file — the reference's contract
  *     (/root/reference/scribedb/postgres.py:51).
  *   - Files register as a temp view named after the side so an
  *     optional `qry` can shape them — the analog of the reference's
  *     view-over-query materialization
  *     (/root/reference/scribedb/postgres.py:79-89), minus the random
  *     names (session-scoped catalog needs none).
  */
object Sources {

  /** The user's query as a derived table usable in a FROM clause.
    * Bare correlation name (no AS): Oracle rejects `AS` on table
    * aliases while PostgreSQL/Derby/MySQL all accept the bare form.
    */
  private def subquery(qry: String, alias: String): String = s"($qry) $alias"

  private def baseReader(
      spark: SparkSession, j: SourceSpec.Jdbc): DataFrameReader = {
    var r = spark.read.format("jdbc").option("url", j.url)
    j.driver.foreach(d => r = r.option("driver", d))
    j.user.foreach(u => r = r.option("user", u))
    j.passwordEnv.foreach { env =>
      val pw = sys.env.getOrElse(env,
        throw new IllegalArgumentException(s"Password env var '$env' is not set"))
      r = r.option("password", pw)
    }
    r
  }

  /** One-scalar-row remote aggregate over `(qry)` — the planning
    * round-trips (COUNT, MIN/MAX bounds) push down through this so
    * planning never pulls the full remote result (O13; the reference
    * likewise pushes its planning counts,
    * /root/reference/scribedb/base.py:71-75).
    */
  private def remoteScalar(
      spark: SparkSession, j: SourceSpec.Jdbc, select: String): org.apache.spark.sql.Row =
    baseReader(spark, j)
      .option("query", s"SELECT $select FROM ${subquery(j.qry, "graft_sq")}")
      .load()
      .head()

  /** Pushed-down `SELECT COUNT(*) FROM (qry)` — exact remote row count
    * as one scalar over the wire. Feeds bucket planning for JDBC sides
    * (Comparator.compareAuto row hints): the full remote query then
    * executes exactly once, in the fingerprint pass.
    */
  def countRemote(spark: SparkSession, j: SourceSpec.Jdbc): Long =
    // toLong: engines disagree on COUNT(*)'s SQL type (Derby INTEGER,
    // PostgreSQL BIGINT, Oracle NUMBER)
    toLong(remoteScalar(spark, j, "COUNT(*) AS n").get(0))

  /** MIN/MAX of the partition column over `(qry)`, for bounds not given
    * in the config, rendered as the strings Spark's partitioned reader
    * parses (numbers verbatim; java.sql.Date/Timestamp toString are the
    * exact `yyyy-MM-dd [HH:mm:ss.f]` forms it expects). None when the
    * query yields no rows (NULL bounds) or min==max — nothing to
    * stride; the caller falls back to the single-connection read.
    */
  private def remoteBounds(
      spark: SparkSession, j: SourceSpec.Jdbc, column: String): Option[(String, String)] = {
    val r = remoteScalar(spark, j,
      s"MIN($column) AS graft_lo, MAX($column) AS graft_hi")
    (r.get(0), r.get(1)) match {
      case (null, _) | (_, null)    => None
      case (lo, hi) if lo == hi     => None
      case (lo: Number, hi: Number) =>
        // integral truncation is safe: bounds are STRIDE hints — rows
        // outside them still land in the unbounded first/last partition
        val (l, h) = (lo.longValue(), hi.longValue())
        if (h > l) Some((l.toString, h.toString)) else None
      case (lo, hi)                 => Some((lo.toString, hi.toString))
    }
  }

  private def toLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case other => throw new IllegalArgumentException(
      s"COUNT(*) must be numeric, got ${other.getClass.getSimpleName}")
  }

  def resolve(spark: SparkSession, side: SideSpec): DataFrame = side.source match {
    case SourceSpec.File(format, path, qry) =>
      val reader = spark.read.format(format)
      val df = format match {
        case "csv" => reader.option("header", "true").option("inferSchema", "true").load(path)
        case _     => reader.load(path)
      }
      qry match {
        case Some(q) =>
          df.createOrReplaceTempView(side.name)
          spark.sql(q)
        case None => df
      }

    case j: SourceSpec.Jdbc =>
      j.partitionColumn match {
        case Some(pc) if j.numPartitions.forall(_ > 1) =>
          val n = j.numPartitions.getOrElse(8)
          val bounds = (j.lowerBound, j.upperBound) match {
            case (Some(lo), Some(hi)) => Some((lo, hi))
            case _                    => remoteBounds(spark, j, pc)
          }
          bounds match {
            case Some((lo, hi)) =>
              baseReader(spark, j)
                .option("dbtable", subquery(j.qry, "graft_part"))
                .option("partitionColumn", pc)
                .option("numPartitions", n)
                .option("lowerBound", lo)
                .option("upperBound", hi)
                .load()
            case None => // empty or single-valued: nothing to stride
              baseReader(spark, j).option("query", j.qry).load()
          }
        case _ =>
          baseReader(spark, j).option("query", j.qry).load()
      }

    case SourceSpec.Sql(qry) =>
      spark.sql(qry)
  }
}
