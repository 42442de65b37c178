package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

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

  /** Z-ordered clustered write: range-partition the rows by their
    * Morton code over (`a`, `b`) ([[graft.functions.ZOrder.zorder2]])
    * into `numFiles` output files, sorted within each — so every file
    * covers a compact rectangle in (a, b) space and parquet min/max
    * stats prune file reads for predicates on EITHER column.
    *
    * Both columns are first normalized to the full 16-bit range
    * (equi-width over their observed min/max — ONE tiny agg pass, four
    * doubles to the driver). Without this the interleave degenerates:
    * a 26-bit id column against an 8-bit category column puts every
    * high significant z-bit on the id side and the curve collapses to
    * a plain sort on it. [[writeZOrderedRankN]] is the skew-robust
    * quantile-normalized refinement for heavy-tailed layout columns;
    * equi-width is the right default for roughly-uniform ones and is
    * what the locality test asserts. Then one range-exchange (with
    * Spark's bounds-sampling pass) — the same cost as any
    * globally-sorted write; the curve column never lands in the
    * output.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      numFiles: Int, spec: SinkSpec = SinkSpec()): Unit =
    writeZOrderedN(df, path, Seq(a, b), numFiles, spec)

  /** n-column form (2 ≤ n ≤ 4) — [[graft.functions.ZOrder.zorderN]]
    * over the equi-width-normalized columns; for n = 2 the layout is
    * bit-identical to the historical two-column writer. Real layout
    * tuning usually wants 3–4 predicate columns (date + key +
    * category), and the curve degrades gracefully: each of n columns
    * gets ≈(1/n)-power pruning.
    */
  def writeZOrderedN(df: DataFrame, path: String, cols: Seq[Column],
      numFiles: Int, spec: SinkSpec = SinkSpec()): Unit = {
    require(numFiles > 0, "need numFiles > 0")
    require(cols.size >= 2 && cols.size <= 4, "writeZOrderedN takes 2..4 columns")
    import org.apache.spark.sql.functions.{coalesce, floor, lit, max, min}
    val aggs = cols.flatMap(c => Seq(min(c).cast("double"), max(c).cast("double")))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input or an all-NULL layout column yields NULL min/max —
    // degrade to constant scaling (plain write order) instead of an
    // opaque NPE before any file lands
    def bound(i: Int): Double = if (mm.isNullAt(i)) 0.0 else mm.getDouble(i)
    val maxV = (1L << graft.functions.ZOrder.bitsFor(cols.size)) - 1
    def scaled(c: Column, lo: Double, hi: Double): Column =
      if (hi > lo)
        floor((coalesce(c.cast("double"), lit(lo)) - lit(lo)) * maxV / lit(hi - lo))
          .cast("long")
      else lit(0L)
    val z = graft.functions.ZOrder.zorderN(
      cols.zipWithIndex.map { case (c, j) => scaled(c, bound(2 * j), bound(2 * j + 1)) })
    val laid = df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    write(laid, path, spec)
  }

  /** Rank-normalized z-ordered write — the skew-robust refinement the
    * equi-width form documents: each layout column is bucketed by its
    * QUANTILE cuts (`approxQuantile`, Greenwald–Khanna — one pass,
    * bounded sketch state, `buckets` doubles per column to the
    * driver) before the Morton interleave, so a heavy-tailed column
    * (lognormal sizes, zipfian counts) spreads its BULK across the
    * curve instead of collapsing into the lowest equi-width cell —
    * under equi-width, a predicate over the bulk range intersects
    * every file and pruning dies exactly where most predicates land.
    * The bucket index is computed by a codegen'd fold over the tiny
    * cuts literal (O(buckets) per row, no join, no global window —
    * rank via `percent_rank()` would funnel the corpus through one
    * unpartitioned sort). NULLs land in bucket 0, same contract as
    * the equi-width form's lo-coalesce.
    */
  def writeZOrderedRankN(df: DataFrame, path: String, cols: Seq[Column],
      numFiles: Int, spec: SinkSpec = SinkSpec(), buckets: Int = 256,
      relErr: Double = 0.001): Unit = {
    require(numFiles > 0, "need numFiles > 0")
    require(cols.size >= 2 && cols.size <= 4, "writeZOrderedRankN takes 2..4 columns")
    // the bucket index must fit the per-column bit budget zorderN
    // actually interleaves (bitsFor: 16 bits at 2-3 cols, 15 at 4) —
    // a wider bucket count would silently truncate high buckets and
    // fold the top of the distribution into the bottom of the curve,
    // quietly destroying the file pruning this layout exists for
    val maxBuckets = 1 << graft.functions.ZOrder.bitsFor(cols.size)
    require(buckets >= 2 && buckets <= maxBuckets,
      s"need 2 <= buckets <= $maxBuckets (the zorderN bit budget for " +
        s"${cols.size} columns)")
    import org.apache.spark.sql.functions.{aggregate, array, coalesce, lit, when}
    val qNames = cols.indices.map(i => s"__q$i")
    val named = cols.zip(qNames).foldLeft(df) { case (d, (c, nm)) =>
      d.withColumn(nm, c.cast("double"))
    }
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts: Array[Array[Double]] =
      named.stat.approxQuantile(qNames.toArray, probs, relErr)
    def bucketed(nm: String, cs: Array[Double]): Column = {
      // distinct ascending cuts (a skewed column repeats quantiles);
      // index = #cuts <= value, a codegen'd fold over the literal array
      val distinctCuts = cs.distinct.sorted
      if (distinctCuts.isEmpty) lit(0L)
      else aggregate(
        array(distinctCuts.map(lit(_)): _*), lit(0L),
        (acc, c) => acc + when(coalesce(col(nm), lit(Double.NegativeInfinity)) >= c, 1L)
          .otherwise(0L))
    }
    val z = graft.functions.ZOrder.zorderN(
      qNames.zip(cuts).map { case (nm, cs) => bucketed(nm, cs) })
    val laid = named.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .drop(qNames: _*)
    write(laid, path, spec)
  }
}
