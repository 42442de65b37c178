package graft.sources

import graft.config.{SideSpec, SourceSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}

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

    case SourceSpec.Jdbc(url, driver, user, passwordEnv, qry) =>
      var r = spark.read.format("jdbc")
        .option("url", url)
        .option("query", qry)
      driver.foreach(d => r = r.option("driver", d))
      user.foreach(u => r = r.option("user", u))
      passwordEnv.foreach { env =>
        val pw = sys.env.getOrElse(env,
          throw new IllegalArgumentException(s"Password env var '$env' is not set"))
        r = r.option("password", pw)
      }
      r.load()

    case SourceSpec.Sql(qry) =>
      spark.sql(qry)
  }
}
