package graft.sources

import org.apache.spark.sql.DataFrame

/** Write-side counterpart of [[Sources]] — the reference has no sink
  * surface at all (results are printed, /root/reference/main.py:116-137);
  * a pipeline engine needs durable outputs.
  *
  * Scale notes: `partitionBy` columns become directory partitions —
  * readers with equality/range filters on them scan only matching
  * directories (partition pruning, asserted in SinksSpec); pick
  * low-cardinality columns or writes explode into tiny files.
  * `maxRecordsPerFile` bounds file size at the other extreme.
  */
object Sinks {

  final case class SinkSpec(
      format: String = "parquet",          // parquet | csv | json | orc
      mode: String = "overwrite",          // overwrite | append | error
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Option[Long] = None,
      options: Map[String, String] = Map.empty)

  def write(df: DataFrame, path: String, spec: SinkSpec = SinkSpec()): Unit = {
    var w = df.write.format(spec.format).mode(spec.mode)
    if (spec.partitionBy.nonEmpty) w = w.partitionBy(spec.partitionBy: _*)
    spec.maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
    val opts = spec.format match {
      case "csv" => Map("header" -> "true") ++ spec.options
      case _     => spec.options
    }
    opts.foreach { case (k, v) => w = w.option(k, v) }
    w.save(path)
  }
}
