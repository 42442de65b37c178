package graft.sources

import graft.{GraftSession, Main, SparkSpec}
import graft.config.ConfigLoader
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  test("csv source roundtrip: write lineitem subset as csv, compare against parquet") {
    val dir = Files.createTempDirectory("csvsrc").toString
    val li = GraftSession.table(spark, Sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag")
    li.coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$dir/li_csv")
    val spec = ConfigLoader.fromYaml(
      s"""source:
         |  name: src
         |  db: {type: csv, path: $dir/li_csv}
         |target:
         |  name: tgt
         |  db:
         |    type: parquet
         |    path: $Sf0001/lineitem.parquet
         |    qry: "SELECT l_orderkey, l_linenumber, l_returnflag FROM tgt"
         |num_buckets: 64
         |schema_check: arity
         |""".stripMargin)
    val rep = Main.run(spark, spec)
    // csv infers int vs parquet long etc., so values must still agree
    // after canonicalization — identical datasets
    assert(rep.identical, rep.verdict)
  }

  test("json source: write and read back documents subset") {
    val dir = Files.createTempDirectory("jsonsrc").toString
    val docs = GraftSession.table(spark, Sf0001, "documents").select("doc_id", "lang")
    docs.coalesce(1).write.mode("overwrite").json(s"$dir/docs_json")
    val spec = ConfigLoader.fromYaml(
      s"""source:
         |  db: {type: json, path: $dir/docs_json, qry: "SELECT doc_id, lang FROM source ORDER BY doc_id"}
         |target:
         |  db:
         |    type: parquet
         |    path: $Sf0001/documents.parquet
         |    qry: "SELECT doc_id, lang FROM target"
         |num_buckets: 32
         |schema_check: arity
         |""".stripMargin)
    val rep = Main.run(spark, spec)
    assert(rep.identical, rep.verdict)
  }

  test("jdbc source without its database fails cleanly (no driver dance, clear error)") {
    val spec = ConfigLoader.fromYaml(
      """source:
        |  db: {type: postgres, host: localhost, port: 5499, dbname: nope, qry: "SELECT 1"}
        |target:
        |  db: {type: sql, qry: "SELECT 1 AS x"}
        |""".stripMargin)
    intercept[Exception](Main.run(spark, spec))
  }
}
