package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The classic (min-rank-first, one occurrence at a time) BPE encode
  * loop, checked three ways: against a straightforward in-test
  * reference implementation over generated corpora and cascade-heavy
  * tables; against hand-computed fixtures for the two documented
  * divergences from the rank-order pass kernel; and through the SQL /
  * codegen / plan surfaces the pass twin also guarantees.
  */
class BpeEncodeMinRankSpec extends SparkSpec {

  import spark.implicits._

  /** Straightforward reference: rescan for the (lowest-rank, leftmost)
    * adjacent in-table pair, merge that ONE occurrence (plain
    * concatenation), repeat to fixpoint. Same tokenization prep as the
    * kernel. Lowest rank wins duplicate pairs.
    */
  private def naive(text: String, merges: Seq[(String, String)]): Vector[String] = {
    val rank = scala.collection.mutable.HashMap[(String, String), Int]()
    merges.zipWithIndex.reverse.foreach { case ((l, r), i) => rank((l, r)) = i + 1 }
    val stripped = text.filter(c => c != '|' && c != '\u001f')
    val trimmed = stripped.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    var ps = trimmed.split(" +", -1).toVector
    var go = true
    while (go) {
      val cands = (0 until ps.length - 1)
        .flatMap(i => rank.get((ps(i), ps(i + 1))).map(r => (r, i)))
      if (cands.isEmpty) go = false
      else {
        val (_, i) = cands.min
        ps = ps.patch(i, Vector(ps(i) + ps(i + 1)), 2)
      }
    }
    ps
  }

  private def kernel(docs: Seq[(Long, String)],
      merges: Seq[(String, String)]): Map[Long, Seq[String]] =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), BpeEncodeMinRank(col("text"), merges).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("cascade: a later merge re-enables an earlier one (the pass kernel never does)") {
    // merges 1:(ab,c), 2:(a,b) over [a b c] — the documented interop
    // divergence: min-rank-first gives [abc], the pass kernel [a•b, c]
    val merges = Seq(("ab", "c"), ("a", "b"))
    val out = kernel(Seq((1L, "a b c")), merges)
    assert(out(1L) == Seq("abc"))
    assert(naive("a b c", merges) == Vector("abc"))
    val pass = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(BpeEncodePieces(col("text"), merges).as("p"))
      .head().getSeq[String](0)
    assert(pass == Seq("a\u001fb", "c"), "pass twin must NOT cascade")
  }

  test("one occurrence at a time by (rank, pos) — not a full pass per rank") {
    // merges 1:(ab,a), 2:(a,b) over [a b a b]: merging the leftmost
    // (a,b) yields [ab, a, b] whose (ab,a) now outranks the remaining
    // (a,b) — result [aba, b]. A full-pass-per-rank loop would merge
    // both (a,b) occurrences first and emit [ab, ab].
    val merges = Seq(("ab", "a"), ("a", "b"))
    val out = kernel(Seq((1L, "a b a b")), merges)
    assert(out(1L) == Seq("aba", "b"))
    assert(naive("a b a b", merges) == Vector("aba", "b"))
  }

  test("self-pair greedy-leftmost; delimiters stripped; empty and single-token docs") {
    val merges = Seq(("a", "a"))
    val out = kernel(Seq(
      (1L, "a a a a a"), // [aa][aa][a]
      (2L, "a| a\u001f a"), // delimiter chars stripped, boundaries kept
      (3L, ""),
      (4L, "q")), merges)
    assert(out(1L) == Seq("aa", "aa", "a"))
    assert(out(2L) == Seq("aa", "a"))
    assert(out(3L) == Seq(""))
    assert(out(4L) == Seq("q"))
  }

  private val base = Vector("a", "b", "c", "d", "ab", "bc")

  private def docGen: Gen[String] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(base)).map(_.mkString(" ")))

  // cascade-shaped table: each merge may consume earlier merges'
  // plain-concat outputs, and the tiny colliding alphabet ("ab" is
  // both a base token and a merge product) forces re-enablement
  private def mergesGen: Gen[List[(String, String)]] =
    Gen.choose(1, 20).flatMap { k =>
      def step(pool: Vector[String], left: Int,
          acc: List[(String, String)]): Gen[List[(String, String)]] =
        if (left == 0) Gen.const(acc.reverse)
        else for {
          l <- Gen.oneOf(pool)
          r <- Gen.oneOf(pool)
          out <- step(pool :+ (l + r), left - 1, (l, r) :: acc)
        } yield out
      step(base, k, Nil)
    }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("property: heap kernel == naive rescan reference over generated corpora and tables") {
    (1L to 8L).foreach { seed =>
      val docs = (1L to 40L).map(i => (i, sample(docGen, seed * 1000 + i)))
      val merges = sample(mergesGen, seed)
      val got = kernel(docs, merges)
      docs.foreach { case (i, text) =>
        val want = naive(text, merges)
        assert(got(i) == want,
          s"seed=$seed doc=$i text='$text' merges=$merges:\n kernel=${got(i)}\n naive=$want")
      }
    }
  }

  test("gate table over real documents: oracle shape holds and the cascade fires") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val out = TextAnalysis.bpeEncodeMinRank(docs, TextAnalysis.MinRankGateMerges)
    val rows = out.collect()
    assert(rows.length == docs.count())
    // pieces_str re-splits to exactly n_pieces pieces, counts consistent
    rows.foreach { r =>
      assert(r.getString(3).split(" ", -1).length == r.getLong(2))
      assert(r.getLong(2) <= r.getLong(1))
    }
    // the rank-1 cascade (tablehash+value) fires on at least one doc —
    // the divergence the gate exists to pin; a pass encode of the same
    // table can never produce this piece
    assert(rows.exists(_.getString(3).contains("tablehashvalue")),
      "fixture drift: no doc exercises the min-rank cascade")
  }

  test("forced codegen: kernel runs inside whole-stage codegen; null stays null") {
    withSQLConf(
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      val vocab = (1 to 5000).map { i =>
        if (i == 1000) ("w1", "w2")
        else if (i == 4000) ("w1w2", "w3") // plain-concat cascade
        else (s"v${i}a", s"v${i}b")
      }
      val d = Seq(Some("w1 w2 w3 tail"), Option.empty[String]).toDF("text")
      val out = d.select(BpeEncodeMinRank(col("text"), vocab).as("p")).collect()
      assert(out(0).getSeq[String](0) == Seq("w1w2w3", "tail"))
      assert(out(1).isNullAt(0))
    }
  }

  test("wrapper evaluates the kernel ONCE (CollapseProject must not duplicate it)") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val out = TextAnalysis.bpeEncodeMinRank(d, TextAnalysis.MinRankGateMerges)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val occurrences = "bpe_encode_minrank".r.findAllIn(plan).length
    assert(occurrences == 1,
      s"kernel must run once per row, plan evaluates it $occurrences times: " +
        plan.take(1200))
  }

  test("30k-merge vocabulary: result identical to the 100-merge prefix that can fire; cost is probe-bound, not table-bound") {
    // the min-rank kernel's per-row cost is O(adjacent-pair probes +
    // merges_applied · log pieces) — INDEPENDENT of table size (the
    // pass kernel pays O(merges) skips per row): 29,900 absent merges
    // must change nothing but the hash map build
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val live = TextAnalysis.MinRankGateMerges
    val vocab = live ++ (1 to (30000 - live.size)).map(i => (s"zzz${i}a", s"zzz${i}b"))
    assert(vocab.size == 30000)
    val small = TextAnalysis.bpeEncodeMinRank(docs, live)
      .collect().map(_.toString).sorted
    val t0 = System.nanoTime()
    val big = TextAnalysis.bpeEncodeMinRank(docs, vocab)
      .collect().map(_.toString).sorted
    val wall = (System.nanoTime() - t0) / 1e9
    info(f"30k-merge min-rank encode over ${small.length} docs: $wall%.2f s")
    assert(big.sameElements(small))
  }

  test("SQL registration: literal-table form equals the Column API; non-literal rejected") {
    graft.plans.GraftExtensions.register(spark)
    val merges = Seq(("ab", "c"), ("a", "b"))
    val litStr = BpeEncodePieces.tableToSql(merges)
    Seq((1L, "a b c"), (2L, "c a b")).toDF("doc_id", "text")
      .createOrReplaceTempView("bpe_minrank_sql_test")
    val viaSql = spark.sql(
      s"SELECT doc_id, bpe_encode_minrank(text, '$litStr') AS p FROM bpe_minrank_sql_test")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaSql(1L) == Seq("abc"))
    assert(viaSql(2L) == Seq("c", "ab"))
    val err = intercept[Exception] {
      spark.sql("SELECT bpe_encode_minrank(text, text) FROM bpe_minrank_sql_test").collect()
    }
    assert(err.getMessage.contains("string literal"))
  }

  test("expressions with equal merge tables are value-equal (canonicalization works)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val m1 = Seq(("a", "b"), ("ab", "c"))
    val m2 = Seq(("a", "b"), ("ab", "c"))
    val child = Literal.create("a b c", org.apache.spark.sql.types.StringType)
    val e1 = BpeEncodeMinRank(child, BpeMergeTable(m1))
    val e2 = BpeEncodeMinRank(child, BpeMergeTable(m2))
    assert(e1 == e2 && e1.semanticEquals(e2))
    assert(e1 != e1.copy(table = BpeMergeTable(m1.reverse)))
    // duplicate pair: the LOWEST rank wins the probe table
    val t = BpeMergeTable(Seq(("a", "b"), ("a", "b")))
    assert(t.minRankIndex.get("a b") == Integer.valueOf(1))
  }
}
