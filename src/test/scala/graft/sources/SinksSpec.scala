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

  test("z-ordered write degrades gracefully on empty and all-null layout columns") {
    import spark.implicits._
    val base = Files.createTempDirectory("zord-null").toString
    // empty input: min/max are NULL — must write (nothing) without NPE
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    Sinks.writeZOrdered(empty, s"$base/empty", col("a"), col("b"), numFiles = 2)
    assert(spark.read.parquet(s"$base/empty").count() == 0)
    // all-null layout column: rows still land, values preserved
    val nulls = Seq((Some(1L), None: Option[Long]), (Some(2L), None))
      .toDF("a", "b")
    Sinks.writeZOrdered(nulls, s"$base/nulls", col("a"), col("b"), numFiles = 2)
    val back = spark.read.parquet(s"$base/nulls")
    assert(back.count() == 2)
    assert(back.select("a").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // mixed: one row's layout value null — row kept, not dropped
    val mixed = Seq((Some(1L), Some(5L)), (Some(2L), None)).toDF("a", "b")
    Sinks.writeZOrdered(mixed, s"$base/mixed", col("a"), col("b"), numFiles = 2)
    assert(spark.read.parquet(s"$base/mixed").count() == 2)
  }

  test("zorder spread/interleave matches hand-computed Morton codes") {
    import spark.implicits._
    val r = Seq((10L, 6L)).toDF("a", "b")
      .select(graft.functions.ZOrder.zorder2(col("a"), col("b"))).head().getLong(0)
    // a=1010b -> even bits 01000100b; b=0110b -> odd bits 00101000b
    assert(r == 108L)
    // z-value must be monotone-safe: (0,0) lowest, full-mask highest
    val lohi = Seq((0L, 0L, 65535L, 65535L)).toDF("a0", "b0", "a1", "b1")
      .select(graft.functions.ZOrder.zorder2(col("a0"), col("b0")),
        graft.functions.ZOrder.zorder2(col("a1"), col("b1"))).head()
    assert(lohi.getLong(0) == 0L && lohi.getLong(1) == 0xFFFFFFFFL)
  }

  test("z-ordered write clusters BOTH layout columns; linear sort only one") {
    val base = Files.createTempDirectory("zord").toString
    val li = GraftSession.table(spark, Sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    // layout A: z-ordered on (orderkey, partkey); layout B: sorted by
    // orderkey alone (the naive clustered write)
    Sinks.writeZOrdered(li, s"$base/z", col("l_orderkey"), col("l_partkey"), 8)
    li.repartitionByRange(8, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.parquet(s"$base/linear")

    def meanSpan(dir: String, c: String): Double = {
      val spans = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val mm = spark.read.parquet(f.toString)
            .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
          mm.getDouble(1) - mm.getDouble(0)
        }
      spans.sum / spans.length
    }
    // the linear layout leaves l_partkey unclustered (≈ whole domain
    // per file); the z-order must shrink its per-file span well below
    // that while still keeping l_orderkey clustered
    val full = meanSpan(s"$base/linear", "l_partkey")
    val zPart = meanSpan(s"$base/z", "l_partkey")
    assert(zPart < 0.7 * full, s"z=$zPart linear=$full")
    val okFull = {
      val mm = li.agg(min(col("l_orderkey")).cast("double"),
        max(col("l_orderkey")).cast("double")).head()
      mm.getDouble(1) - mm.getDouble(0)
    }
    assert(meanSpan(s"$base/z", "l_orderkey") < 0.7 * okFull)
  }

  test("rank z-order: heavy-tailed bulk prunes where equi-width collapses") {
    import spark.implicits._
    val base = Files.createTempDirectory("zrank").toString
    // a = uniform key; b = heavy-tailed (exp of uniform): 90% of rows
    // live in the lowest ~0.5% of b's RANGE, so equi-width puts the
    // whole bulk in one cell and a bulk-range predicate touches every
    // file; rank buckets spread the bulk across the curve
    val rng = new scala.util.Random(7)
    val rows = (1 to 20000).map { i =>
      (i.toLong, math.exp(rng.nextDouble() * 12.0)) // 1 .. ~160k, log-uniform
    }
    val df = rows.toDF("a", "b")
    Sinks.writeZOrdered(df, s"$base/eq", col("a"), col("b"), numFiles = 16)
    Sinks.writeZOrderedRankN(df, s"$base/rank", Seq(col("a"), col("b")),
      numFiles = 16)
    // both layouts hold the same bag
    assert(spark.read.parquet(s"$base/rank").count() == 20000)
    assert(spark.read.parquet(s"$base/rank").agg(sum(col("a"))).head().getLong(0)
      == df.agg(sum(col("a"))).head().getLong(0))
    // bulk-range predicate: the middle quintiles of the DISTRIBUTION
    val cuts = df.stat.approxQuantile("b", Array(0.4, 0.6), 0.001)
    def filesHit(dir: String): Int =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).count { f =>
          val mm = spark.read.parquet(f.toString)
            .agg(min(col("b")), max(col("b"))).head()
          mm.getDouble(0) <= cuts(1) && mm.getDouble(1) >= cuts(0)
        }
    val eqHit = filesHit(s"$base/eq")
    val rankHit = filesHit(s"$base/rank")
    // equi-width: the bulk shares one b-cell, every file carries bulk
    // rows, nothing prunes; rank: strictly fewer files intersect
    // the load-bearing claim is RELATIVE (equi-width cannot prune the
    // bulk at all); the absolute bound is a sanity backstop with slack
    // for approxQuantile's merge-order wiggle across suite runs
    assert(rankHit < eqHit, s"rank=$rankHit eq=$eqHit")
    assert(eqHit >= 15, s"fixture broken: equi-width should hit ~all files, hit $eqHit/16")
    assert(rankHit <= 11, s"rank layout should prune several files, hit $rankHit/16")
  }

  test("rank z-order: bucket count above the interleave bit budget fails loudly") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L, 4L)).toDF("a", "b", "c", "d")
    val cols4 = Seq(col("a"), col("b"), col("c"), col("d"))
    // 4 layout columns → bitsFor(4) = 15 bits → max 32768 buckets;
    // anything above would silently truncate the high buckets and fold
    // the top of the distribution into the bottom of the curve
    val msg = intercept[IllegalArgumentException](
      Sinks.writeZOrderedRankN(df, "/tmp/never-written", cols4,
        numFiles = 1, buckets = 32769)).getMessage
    assert(msg.contains("32768"))
    // 2 columns → 16 bits → 65536 is still the cap
    val msg2 = intercept[IllegalArgumentException](
      Sinks.writeZOrderedRankN(df, "/tmp/never-written",
        Seq(col("a"), col("b")), numFiles = 1, buckets = 65537)).getMessage
    assert(msg2.contains("65536"))
  }

  test("zorderN: n=2 bit-identical to zorder2; 3-bit hand Morton; bounds") {
    import spark.implicits._
    val r = Seq((10L, 6L, 5L)).toDF("a", "b", "c").select(
      graft.functions.ZOrder.zorderN(Seq(col("a"), col("b"))).as("z2n"),
      graft.functions.ZOrder.zorder2(col("a"), col("b")).as("z2"),
      graft.functions.ZOrder.zorderN(Seq(col("a"), col("b"), col("c"))).as("z3"))
      .head()
    assert(r.getLong(0) == r.getLong(1)) // generic ladder == mask ladder
    // a=1010b -> bits at 3i+0; b=0110b -> 3i+1; c=0101b -> 3i+2
    // expected: sum over set bits
    val expect = (Seq(1, 3).map(i => 1L << (3 * i)) ++
      Seq(1, 2).map(i => 1L << (3 * i + 1)) ++
      Seq(0, 2).map(i => 1L << (3 * i + 2))).sum
    assert(r.getLong(2) == expect)
    val lohi = Seq((0L, 65535L)).toDF("lo", "hi").select(
      graft.functions.ZOrder.zorderN(Seq(col("lo"), col("lo"), col("lo"))),
      graft.functions.ZOrder.zorderN(Seq(col("hi"), col("hi"), col("hi"))))
      .head()
    assert(lohi.getLong(0) == 0L && lohi.getLong(1) == (1L << 48) - 1)
  }

  test("3-column z-ordered write clusters ALL THREE layout columns") {
    val base = Files.createTempDirectory("zord3").toString
    val li = GraftSession.table(spark, Sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    Sinks.writeZOrderedN(li, s"$base/z3",
      Seq(col("l_orderkey"), col("l_partkey"), col("l_suppkey")), 8)
    li.repartitionByRange(8, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.parquet(s"$base/linear3")
    def meanSpan(dir: String, c: String): Double = {
      val spans = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val mm = spark.read.parquet(f.toString)
            .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
          mm.getDouble(1) - mm.getDouble(0)
        }
      spans.sum / spans.length
    }
    // the single-column sort leaves partkey AND suppkey unclustered;
    // the 3-d curve must shrink the per-file span of BOTH (the n=3
    // pruning power is weaker than n=2, so the bar is 0.8, not 0.7)
    assert(meanSpan(s"$base/z3", "l_partkey")
      < 0.8 * meanSpan(s"$base/linear3", "l_partkey"))
    assert(meanSpan(s"$base/z3", "l_suppkey")
      < 0.8 * meanSpan(s"$base/linear3", "l_suppkey"))
  }
}
