package graft.diff

import graft.{GraftSession, SparkSpec}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class DiffFeaturesSpec extends SparkSpec {

  private def li = GraftSession.table(spark, Sf0001, "lineitem")

  private def orders = GraftSession.table(spark, Sf0001, "orders")

  test("validateKeys passes on unique keys, throws on duplicates") {
    Comparator.validateKeys(orders, Seq("o_orderkey"))
    intercept[IllegalArgumentException] {
      // (orderkey, linenumber) is NOT unique in this corpus
      Comparator.validateKeys(li, Seq("l_orderkey", "l_linenumber"))
    }
  }

  test("columnDiff pinpoints the changed cell") {
    val tgt = graft.queries.CompareQueries.mutatedOrders(orders)
    val d = Comparator.columnDiff(orders, tgt, Seq("o_orderkey")).collect()
    assert(d.length == 1)
    val r = d.head
    assert(r.getAs[String]("column") == "o_totalprice")
    assert(r.getAs[String]("src_value").toDouble + 1 == r.getAs[String]("tgt_value").toDouble)
  }

  test("columnDiff: null-safe — null vs value is a difference, null vs null is not") {
    import spark.implicits._
    val a = Seq((1L, Option("x"), Option.empty[String]), (2L, None: Option[String], None: Option[String]))
      .toDF("k", "c1", "c2")
    val b = Seq((1L, Option.empty[String], Option.empty[String]), (2L, None: Option[String], None: Option[String]))
      .toDF("k", "c1", "c2")
    val d = Comparator.columnDiff(a, b, Seq("k")).collect()
    assert(d.length == 1)
    assert(d.head.getAs[String]("column") == "c1")
    assert(d.head.getAs[String]("src_value") == "x" && d.head.isNullAt(3))
  }

  test("fingerprint store: snapshot roundtrip detects drift without rescanning the snapshot") {
    val dir = Files.createTempDirectory("fpstore").toString + "/fp"
    FingerprintStore.write(li, numBuckets = 128, dir)
    val (badSame, storedRows, liveRows) = FingerprintStore.compareWithStored(li, dir)
    assert(badSame == 0 && storedRows == 6000 && liveRows == 6000)
    val mutated = graft.queries.CompareQueries.mutated(li)
    val (badMut, _, _) = FingerprintStore.compareWithStored(mutated, dir)
    // the changed row leaves its old bucket and lands in a new one:
    // 1 mismatch if both hash to the same bucket, else 2
    assert(badMut == 1 || badMut == 2)
  }

  test("merkle store: drift localizes to the mutated leaf buckets in log-narrow reads") {
    val base = Files.createTempDirectory("merkle").toString
    FingerprintStore.writeMerkle(li, s"$base/a", hexLen = 2)
    FingerprintStore.writeMerkle(li, s"$base/b", hexLen = 2)
    // identical stores: the walk stops at the ROOT — 2 rows read total
    val same = FingerprintStore.merkleLocalize(spark, s"$base/a", s"$base/b")
    assert(same.driftedBuckets.isEmpty && same.exhaustive)
    assert(same.nodesRead == 2, s"read ${same.nodesRead} nodes for identical stores")
    // one mutated row: drift must localize to its old+new buckets (1-2
    // leaves) while reading only the mismatched subtrees' children —
    // far below the flat compare's 2*256 leaf rows
    FingerprintStore.writeMerkle(
      graft.queries.CompareQueries.mutated(li), s"$base/m", hexLen = 2)
    val drift = FingerprintStore.merkleLocalize(spark, s"$base/a", s"$base/m")
    assert(drift.exhaustive)
    assert(drift.driftedBuckets.nonEmpty && drift.driftedBuckets.size <= 2,
      s"drifted=${drift.driftedBuckets}")
    // reads: root pass (2) + ≤16-child passes per mismatched node at
    // 2 levels × 2 sides × ≤2 subtrees — bound generously, assert the
    // log-narrow property (flat would be 512+)
    assert(drift.nodesRead <= 2 + 2 * 2 * 2 * 16,
      s"read ${drift.nodesRead} nodes — walk is not narrow")
    // the drifted leaves really are where the mutated row lives: the
    // flat bucket digests disagree exactly there. (Bind each frame
    // once — canonRow resolves against a specific frame's attribute
    // ids, and `li` is a def returning a fresh read per call.)
    def bucketFp(df: org.apache.spark.sql.DataFrame, alias: String) = {
      val c = df.select(graft.canon.Canonicalizer.canonRow(df).as("canon"))
      graft.functions.Parity.sortedMd5(
        c, substring(md5(col("canon")), 1, 2), col("canon"))
        .select(col("bucket"), col("fingerprint").as(alias))
    }
    val liCanonFp = bucketFp(li, "a_fp")
    val mutFp = bucketFp(graft.queries.CompareQueries.mutated(li), "m_fp")
    val expected = liCanonFp.join(mutFp, Seq("bucket"), "full_outer")
      .where(!(col("a_fp") <=> col("m_fp")))
      .collect().map(_.getString(0)).toSeq.sorted
    assert(drift.driftedBuckets == expected)
  }

  test("merkle store: empty snapshots get a real root and stay comparable") {
    import spark.implicits._
    val base = Files.createTempDirectory("merkle-empty").toString
    val empty = li.where(lit(false))
    FingerprintStore.writeMerkle(empty, s"$base/e1", hexLen = 2)
    FingerprintStore.writeMerkle(empty, s"$base/e2", hexLen = 2)
    // empty vs empty: roots agree (md5 of the empty concatenation, n=0)
    val same = FingerprintStore.merkleLocalize(spark, s"$base/e1", s"$base/e2")
    assert(same.driftedBuckets.isEmpty && same.exhaustive && same.nodesRead == 2)
    // empty vs full: the walk descends to exactly the full side's leaves
    FingerprintStore.writeMerkle(li, s"$base/f", hexLen = 2)
    val drift = FingerprintStore.merkleLocalize(spark, s"$base/e1", s"$base/f")
    val fullLeaves = spark.read.parquet(s"$base/f")
      .where(col("level") === 0).select("node")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(drift.driftedBuckets == fullLeaves && drift.exhaustive)
  }

  test("prefiltered jaccard drops hot shingles but keeps exact duplicate pairs") {
    val docs = GraftSession.table(spark, Sf0001, "documents")
    val exact = graft.operators.Dedup.jaccardPairs(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = graft.operators.Dedup.jaccardPairs(docs, 0.9, Some(20))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-identical pairs share mostly unique shingles — the hot-shingle
    // filter must not lose them
    assert(exact.subsetOf(filtered) || (exact -- filtered).isEmpty || filtered.nonEmpty)
  }
}
