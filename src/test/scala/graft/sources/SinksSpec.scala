package graft.sources

import graft.{GraftSession, SparkSpec}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  test("partitioned parquet write + partition pruning on read-back") {
    val dir = Files.createTempDirectory("sink").toString + "/events_p"
    val ev = GraftSession.table(spark, Sf0001, "events")
      .select("event_id", "event_type", "value")
    Sinks.write(ev, dir, Sinks.SinkSpec(partitionBy = Seq("event_type")))

    // directory layout is the partition scheme
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.exists(_.startsWith("event_type=")), dirs.mkString(","))

    val back = spark.read.parquet(dir).where(col("event_type") === "click")
    // pruning: the scan's partition filters carry the predicate and the
    // row count matches exactly
    val scanLine = back.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("PartitionFilters:") && scanLine.contains("event_type"), scanLine)
    assert(back.count() == ev.where(col("event_type") === "click").count())
  }

  test("csv and json sinks round-trip values") {
    val base = Files.createTempDirectory("sink2").toString
    val docs = GraftSession.table(spark, Sf0001, "documents").select("doc_id", "lang")
    Sinks.write(docs, s"$base/csv", Sinks.SinkSpec(format = "csv"))
    Sinks.write(docs, s"$base/json", Sinks.SinkSpec(format = "json"))
    val fromCsv = spark.read.option("header", "true").csv(s"$base/csv")
      .select(col("doc_id").cast("long"), col("lang"))
    val fromJson = spark.read.json(s"$base/json").select(col("doc_id"), col("lang"))
    assert(fromCsv.exceptAll(docs).isEmpty && docs.exceptAll(fromCsv).isEmpty)
    assert(fromJson.exceptAll(docs).isEmpty && docs.exceptAll(fromJson).isEmpty)
  }

  test("orc sink round-trips through the config source path") {
    import graft.config.{SideSpec, SourceSpec}
    val base = Files.createTempDirectory("sink4").toString
    val docs = GraftSession.table(spark, Sf0001, "documents").select("doc_id", "lang")
    Sinks.write(docs, s"$base/orc", Sinks.SinkSpec(format = "orc"))
    val back = Sources.resolve(spark,
      SideSpec("orc_side", SourceSpec.File("orc", s"$base/orc", None)))
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("maxRecordsPerFile bounds output file size") {
    val dir = Files.createTempDirectory("sink3").toString + "/li"
    val li = GraftSession.table(spark, Sf0001, "lineitem").limit(1000)
    Sinks.write(li, dir, Sinks.SinkSpec(maxRecordsPerFile = Some(100)))
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 10, s"expected >=10 files, got $files")
  }
}
