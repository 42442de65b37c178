package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def records = Seq(
    (1L, "red bolt", "B1"),
    (2L, "red bolt", "B1"),   // exact duplicate of 1 (dist 0)
    (3L, "ted bolt", "B1"),   // one edit from "red bolt"
    (4L, "blue bolt", "B1"),  // dist("red bolt","blue bolt") = 3 -> links
    (5L, "red bolt", "B2"),   // same name, different brand: other block
    (6L, "green gear", "B1"), // different noun: other block
    (7L, "grain gear", "B1")) // dist("green gear","grain gear") = 2 -> links
    .toDF("id", "name", "brand")

  private def block = concat_ws("|", element_at(split(col("name"), " "), 2), col("brand"))

  test("blocked pairs: candidates meet only inside a block, verified by edit distance") {
    val pairs = EntityResolution
      .blockedPairs(records, col("id"), col("name"), block, maxDist = 3)
      .select("id_a", "id_b", "name_dist")
      .as[(Long, Long, Long)].collect().toSet
    // bolt|B1 block: (1,2) d0, (1,3) d1, (2,3) d1; "blue bolt" sits at
    // d4 from both names -> out. gear|B1 block: (6,7) d2. Cross-block
    // pairs (e.g. 1-5 same name other brand, 1-6) never form.
    assert(pairs == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L), (6L, 7L, 2L)))
  }

  test("oversized blocks are dropped from pairing and surface in the audit view") {
    val pairs = EntityResolution
      .blockedPairs(records, col("id"), col("name"), block, maxDist = 3, maxBlockSize = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // bolt|B1 has 4 records > cap -> dropped wholesale; gear|B1 (2) survives
    assert(pairs == Set((6L, 7L)))
    val over = EntityResolution.oversizedBlocks(records, block, 3)
      .as[(String, Long)].collect().toSet
    assert(over == Set(("bolt|B1", 4L)))
  }

  test("clusters: linked records share a component, min id is the keeper") {
    val pairs = EntityResolution.blockedPairs(records, col("id"), col("name"), block, maxDist = 3)
    val cl = EntityResolution.clusters(records, col("id"), pairs)
      .select("rec_id", "cluster_id", "is_keeper")
      .as[(Long, Long, Boolean)].collect().toSeq
    val byId = cl.map(r => r._1 -> r._2).toMap
    assert(cl.length == 7)
    // {1,2,3} one entity line, {6,7} another, {4} and {5} alone
    assert(Set(1L, 2L, 3L).map(byId) == Set(1L))
    assert(Set(6L, 7L).map(byId) == Set(6L))
    assert(byId(4L) == 4L && byId(5L) == 5L)
    assert(cl.filter(_._3).map(_._1).toSet == Set(1L, 4L, 5L, 6L))
  }

  test("blocked self-join never degenerates to a cartesian plan") {
    val pairs = EntityResolution.blockedPairs(records, col("id"), col("name"), block)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("golden records: per-cluster attribute mode, null never wins, ties by value") {
    import spark.implicits._
    val recs = Seq(
      (1L, "acme", "x"), (2L, "acme", "y"), (3L, "acmee", null.asInstanceOf[String]),
      (4L, "solo", "z")).toDF("id", "brand", "kind")
    val cl = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("rec_id", "cluster_id")
    val g = EntityResolution.goldenRecords(recs, col("id"), cl, Seq("brand", "kind"))
      .orderBy("cluster_id").collect()
    // cluster 1: brand mode acme (2 vs 1); kind tie x/y -> x; null ignored
    assert(g(0).getLong(0) == 1L && g(0).getLong(1) == 3L
      && g(0).getString(2) == "acme" && g(0).getString(3) == "x")
    assert(g(1).getLong(0) == 4L && g(1).getLong(1) == 1L
      && g(1).getString(2) == "solo" && g(1).getString(3) == "z")
  }

  test("match scores: evidence weights accumulate; equality is null-safe") {
    import spark.implicits._
    val recs = Seq(
      (1L, "x", "B1", Option("JAR")),
      (2L, "x", "B1", None: Option[String]),
      (3L, "x", "B2", None: Option[String])).toDF("id", "name", "brand", "cont")
    val pairs = Seq((1L, 2L, 0L), (2L, 3L, 1L)).toDF("id_a", "id_b", "name_dist")
    val r = EntityResolution.matchScores(recs, col("id"), pairs,
      Seq("brand" -> 30L, "cont" -> 20L)).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(3)).toMap
    // (1,2): 3 edits unspent ·10 + brand 30 + cont JAR vs NULL 0 = 60
    // (2,3): 2·10 + brand differs 0 + NULL <=> NULL agrees 20 = 40
    assert(r == Map((1L, 2L) -> 60L, (2L, 3L) -> 40L))
  }

  test("golden records plan: shared base join is cached and released on release()") {
    import spark.implicits._
    val recs = Seq(
      (1L, "acme", "x"), (2L, "acme", "y"), (3L, "acmee", "x"),
      (4L, "solo", "z")).toDF("id", "brand", "kind")
    val cl = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("rec_id", "cluster_id")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    (1 to 3).foreach { _ =>
      val p = EntityResolution.goldenRecordsPlan(recs, col("id"), cl, Seq("brand", "kind"))
      assert(p.df.count() == 2)
      p.release()
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"released golden-record plans leaked caches: $leaked")
  }

  test("blocking profile: hand-computed size histogram and exact pair cost") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // blocks: A×3, B×2, C×1, D×1 → sizes {1: 2 blocks, 2: 1, 3: 1}
    val d = Seq("A", "A", "A", "B", "B", "C", "D").zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("rec_id", "block")
    val r = EntityResolution.blockingProfile(d, col("block")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // n_pairs per size s with m blocks: s(s-1)/2 · m — the exact cost
    // blockedPairs' verify join pays
    assert(r.toSeq == Seq((1L, 2L, 2L, 0L), (2L, 1L, 2L, 1L), (3L, 1L, 3L, 3L)))
  }

  test("sorted neighborhood: window pairs by sort order, partition-count invariant") {
    import spark.implicits._
    // ids deliberately NOT in name order: rank order is b(2) c(3) d(1) e(4)
    val d = Seq((2L, "bob"), (3L, "carl"), (1L, "dave"), (4L, "eve"))
      .toDF("id", "name")
    def run(ranges: Int) = EntityResolution
      .sortedNeighborhoodPairs(d, col("id"), col("name"), window = 2, numRanges = ranges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // window 2 = adjacent-in-order pairs only, id_a = lower rank
    val expect = Set((2L, 3L, 1L), (3L, 1L, 1L), (1L, 4L, 1L))
    assert(run(1) == expect)
    // the distributed rank (ranges > rows forces empty + tiny ranges,
    // pairs straddling every boundary) must not move a bit
    assert(run(3) == expect && run(8) == expect)
    // window 3 adds the rank-distance-2 pairs
    val w3 = EntityResolution
      .sortedNeighborhoodPairs(d, col("id"), col("name"), window = 3, numRanges = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(w3 == expect ++ Set((2L, 1L, 2L), (3L, 4L, 2L)))
    // the plan never degenerates to a global single-partition window:
    // the one Window node partitions by the range id (__pid)
    val plan = EntityResolution
      .sortedNeighborhoodPairs(d, col("id"), col("name"), window = 2, numRanges = 4)
      .queryExecution.executedPlan.toString
    val winLine = plan.linesIterator.find(_.contains("Window")).getOrElse("")
    assert(winLine.contains("__pid"), plan.take(900))
  }

  test("sorted neighborhood: numeric sort keys order numerically, not lexicographically") {
    import spark.implicits._
    // lexicographic order would be 10 < 2 < 9; numeric is 2 < 9 < 10
    val d = Seq((1L, 10L), (2L, 2L), (3L, 9L)).toDF("id", "k")
    val got = EntityResolution
      .sortedNeighborhoodPairs(d, col("id"), col("k"), window = 2, numRanges = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // adjacent under numeric order: (2,9) -> ids (2,3); (9,10) -> (3,1)
    assert(got == Set((2L, 3L), (3L, 1L)))
  }

  test("multi-pass sorted neighborhood: reversed-name pass recovers leading-token typos a single pass misses") {
    import spark.implicits._
    // 'zmith john' is a leading-char typo of 'smith john': the name
    // order exiles it to the far end (padding rows in between), but
    // the REVERSED order brings the two back to adjacency
    val d = Seq(
      (1L, "smith john"), (2L, "zmith john"),
      (3L, "miller ann"), (4L, "parker bea"), (5L, "taylor cid")
    ).toDF("id", "name")
    val single = EntityResolution
      .sortedNeighborhoodPairs(d, col("id"), col("name"), window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!single.contains((1L, 2L)) && !single.contains((2L, 1L)),
      "fixture broken: single name pass should miss the typo pair")
    val multi = EntityResolution
      .sortedNeighborhoodMulti(d, col("id"),
        Seq(col("name"), reverse(col("name"))), window = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // normalized to id_a < id_b; surfaced by exactly the reversed pass
    assert(multi.contains((1L, 2L)))
    assert(multi((1L, 2L)) == ((1L, 1L))) // n_keys = 1, min_rank_dist = 1
    // a pair adjacent under BOTH orders reports n_keys = 2
    assert(multi.keySet.exists(p => multi(p)._1 == 2L))
    // union semantics: every single-pass pair survives (normalized)
    val singleNorm = single.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    assert(singleNorm.subsetOf(multi.keySet))
    // managed form: release() runs every pass finalizer without error
    val plan = EntityResolution.sortedNeighborhoodMultiPlan(d, col("id"),
      Seq(col("name"), reverse(col("name"))), window = 2)
    assert(plan.df.count() == multi.size)
    // plan shape: both passes' windows stay range-partitioned (__pid),
    // no global single-partition window, no cartesian anywhere
    val phys = plan.df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val winLines = phys.linesIterator.filter(_.contains("Window ")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("__pid")), phys.take(1200))
    assert(!phys.contains("Cartesian"), phys.take(1200))
    plan.release()
  }

  test("threshold sweep: nested survival curve, empty thresholds report zero rows") {
    import spark.implicits._
    val scored = Seq((1L, 2L, 50L), (2L, 3L, 20L), (4L, 5L, 80L))
      .toDF("id_a", "id_b", "score")
    val r = EntityResolution.thresholdSweep(scored, Seq(0L, 30L, 60L, 90L))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(
      0L -> ((3L, 5L)),   // all pairs, records {1..5}
      30L -> ((2L, 4L)),  // scores 50, 80
      60L -> ((1L, 2L)),  // score 80 only
      90L -> ((0L, 0L)))) // nothing survives, row still present
    // monotone by construction: pairs and records never increase
    val sorted = r.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.sliding(2).forall(s =>
      s.length < 2 || (s(0)._1 >= s(1)._1 && s(0)._2 >= s(1)._2)))
  }
}
