package graft.operators

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs = GraftSession.table(spark, Sf0001, "documents")

  test("hash split: total coverage, weight accuracy, determinism") {
    val s = Sampling.hashSplit(docs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(counts.values.sum == n) // every row labeled exactly once
    // 500 docs: binomial(500, 0.8) is within ±6σ ≈ ±54 of 400
    assert(math.abs(counts("train") - 0.8 * n) < 60, s"train=${counts("train")}")
    // identical across runs (pure hash function)
    val again = Sampling.hashSplit(docs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s.orderBy("doc_id").collect().toSeq == again.orderBy("doc_id").collect().toSeq)
  }

  test("hash split: assignment is stable under subsetting (no reshuffle on ingestion)") {
    val full = Sampling.hashSplit(docs, col("doc_id"), Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val subset = Sampling.hashSplit(docs.where(col("doc_id") % 3 === 0),
        col("doc_id"), Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the same key gets the same split whether or not other rows exist
    subset.foreach { case (id, sp) => assert(full(id) == sp, s"doc $id moved splits") }
  }

  test("hash split: independent salts decorrelate assignments") {
    val a = Sampling.hashSplit(docs, col("doc_id"), Seq("x" -> 0.5, "y" -> 0.5), salt = "s1")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs, col("doc_id"), Seq("x" -> 0.5, "y" -> 0.5), salt = "s2")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val agree = a.count { case (id, sp) => b(id) == sp }
    // independent 50/50 splits agree on ~half the keys, not all/none
    assert(agree > a.size * 0.3 && agree < a.size * 0.7, s"agree=$agree of ${a.size}")
  }

  test("heavy hitters: exact counts, deterministic tie-break, k rows") {
    val hh = Sampling.heavyHitters(docs, 10).collect()
    assert(hh.length == 10)
    // descending counts; ties broken by token ascending
    hh.sliding(2).foreach { case Array(x, y) =>
      val (cx, cy) = (x.getLong(1), y.getLong(1))
      assert(cx > cy || (cx == cy && x.getString(0) < y.getString(0)))
    }
    // spot-check the top token's count against a direct aggregation
    val top = hh.head
    val direct = docs.select(explode(split(trim(col("text")), " +")).as("t"))
      .where(col("t") === top.getString(0)).count()
    assert(top.getLong(1) == direct)
  }

  test("count-min sketch: estimates bound the exact counts within eps*N") {
    val eps = 0.001
    val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(Sampling.tokenSketch(docs, eps = eps)))
    val exact = Sampling.heavyHitters(docs, 20).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val totalTokens = docs
      .select(size(split(trim(col("text")), " +")).as("n"))
      .agg(sum("n")).head().getLong(0)
    exact.foreach { case (tok, n) =>
      val est = sk.estimateCount(tok)
      assert(est >= n, s"CMS must never underestimate: $tok $est < $n")
      assert(est <= n + (eps * totalTokens).toLong + 1,
        s"CMS overestimate out of bound: $tok est=$est exact=$n")
    }
  }

  test("keeper election picks the highest-quality doc per cluster, tie-break min id") {
    import spark.implicits._
    val clusters = Seq((1L, 10L), (2L, 10L), (3L, 10L), (7L, 70L), (8L, 70L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L), (8L, 4L))
      .toDF("doc_id", "score")
    val k = Dedup.keeperByQuality(clusters, scores).orderBy("cluster_id").collect()
    assert(k.length == 2)
    // cluster 10: scores (5,9,9) — doc 2 wins the tie against doc 3
    assert(k(0).getLong(0) == 10L && k(0).getLong(1) == 2L &&
      k(0).getLong(2) == 9L && k(0).getLong(3) == 3L)
    // cluster 70: tie (4,4) — min doc_id 7 wins
    assert(k(1).getLong(0) == 70L && k(1).getLong(1) == 7L)
  }
}
