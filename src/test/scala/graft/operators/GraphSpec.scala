package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("pagerank: one round on a hand-computed star graph, exact fixed-point values") {
    import spark.implicits._
    // undirected star a–b, a–c as directed edge pairs
    val e = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 1).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // N=3: r0 = 333333333333 each; base = 15e12/300 = 50000000000
    // a receives b and c whole: 85% of 666666666666 + base
    assert(r("a") == 50000000000L + 85L * 666666666666L / 100L)
    // b (and c) receive half of a: 85% of 166666666666 + base
    assert(r("b") == 50000000000L + 85L * 166666666666L / 100L)
    assert(r("c") == r("b"))
  }

  test("pagerank: hub outranks leaves after 3 rounds; result is partitioning-invariant") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
      ("a", "d"), ("d", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 3)
    val byId = r.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byId("a") > byId("b") && byId("a") > byId("d"))
    val re = Graph.pageRank(e.repartition(7), iters = 3)
    assert(re.collect().map(x => x.getString(0) -> x.getLong(1)).toMap == byId)
  }

  test("triangle count: K4 minus one edge has exactly two triangles") {
    import spark.implicits._
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("u", "v")
    val plan = Graph.triangleCountPlan(e)
    val r = plan.df.head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L)
    plan.release()
  }

  test("co-purchase edges: support threshold drops accidental pairs") {
    import spark.implicits._
    val li = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val e = Graph.copurchaseEdges(li, minSupport = 2)
      .as[(Long, Long)].collect().toSet
    assert(e == Set((10L, 20L))) // (10,30) co-occurs once -> dropped
  }

  test("part-supplier edges: both directions, distinct pairs only") {
    import spark.implicits._
    val li = Seq((1L, 10L), (1L, 10L), (2L, 10L)).toDF("l_partkey", "l_suppkey")
    val e = Graph.partSupplierEdges(li).as[(String, String)].collect().toSet
    assert(e == Set(("p1", "s10"), ("s10", "p1"), ("p2", "s10"), ("s10", "p2")))
  }
}
