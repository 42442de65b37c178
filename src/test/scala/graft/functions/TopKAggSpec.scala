package graft.functions

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  test("per-group top-k equals the window form, including ties and short groups") {
    val d = Seq(
      // group 1: ties at 5.0 — ids 11 and 12 both beat id 13's 4.0
      (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 4.0), (1L, 14L, 1.0),
      // group 2: fewer rows than k
      (2L, 21L, 9.0),
      // group 3: strictly ordered
      (3L, 31L, 3.0), (3L, 32L, 2.0), (3L, 33L, 1.0), (3L, 34L, 7.0))
      .toDF("g", "id", "score")
    val agg = d.groupBy(col("g"))
      .agg(TopKAgg(col("score"), col("id"), 3).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("idx", "t")))
      .select(col("g"), (col("idx") + 1).as("rank"),
        col("t.id").as("id"), col("t.score").as("score"))
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val win = d.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .select("g", "rank", "id", "score")
    assert(agg.orderBy("g", "rank").collect().toSeq ==
      win.orderBy("g", "rank").collect().toSeq)
    // tie order concrete: group 1 ranks are 11(5.0), 12(5.0), 13(4.0)
    val g1 = agg.where(col("g") === 1).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq
    assert(g1 == Seq(11L, 12L, 13L))
    // short group survives whole
    assert(agg.where(col("g") === 2).count() == 1)
  }

  test("matches the window form on a real table; nulls contribute nothing") {
    val o = GraftSession.table(spark, Sf0001, "orders")
    val agg = o.groupBy(col("o_custkey"))
      .agg(TopKAgg(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("t"))
      .select(col("o_custkey"), col("t.id"), col("t.score"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = o.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey").as("id"),
        col("o_totalprice").as("score"))
    assert(agg.orderBy("o_custkey", "id").collect().toSeq ==
      win.orderBy("o_custkey", "id").collect().toSeq)
    // null score rows are ignored, not crashed on or emitted
    val n = Seq((1L, Some(1.0), 10L), (1L, None, 11L)).toDF("g", "score", "id")
    val r = n.groupBy("g").agg(TopKAgg(col("score"), col("id"), 2).as("top"))
      .select(size(col("top"))).head().getInt(0)
    assert(r == 1)
  }

  test("plans as ObjectHashAggregate with a map-side partial stage") {
    val o = GraftSession.table(spark, Sf0001, "orders")
    val plan = o.groupBy(col("o_custkey"))
      .agg(TopKAgg(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .queryExecution.executedPlan.toString
    // partial + final ObjectHashAggregate around one exchange: the
    // shuffle carries <= k pairs per (group, input partition), never
    // the raw rows — remove the partial stage and this fails
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(1200))
    assert(plan.contains("partial_topk_agg") || plan.contains("partial topk_agg")
      || plan.toLowerCase.contains("partial"), plan.take(1200))
  }

  test("NaN scores follow SQL's DESC total order (NaN first) and cannot poison the heap") {
    val d = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, 1.0), (1L, 12L, 2.0), (1L, 13L, 3.0))
      .toDF("g", "id", "score")
    val agg = d.groupBy(col("g"))
      .agg(TopKAgg(col("score"), col("id"), 2).as("top"))
      .select(explode(col("top.id"))).as[Long].collect().toSeq
    // the window form: ORDER BY score DESC puts NaN first, then 3.0 —
    // insertion order (NaN arriving first) must not reject 2.0/3.0
    val win = d.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("score").desc, col("id"))))
      .where(col("rn") <= 2).orderBy("rn")
      .select("id").as[Long].collect().toSeq
    assert(agg == win && agg == Seq(10L, 13L))
    // int ids and int scores accepted (widened), bad types rejected
    val ints = Seq((1, 5, 7)).toDF("g", "id", "score")
      .groupBy("g").agg(TopKAgg(col("score"), col("id"), 1).as("t"))
      .select(explode(col("t.id"))).as[Long].head()
    assert(ints == 5L)
    val err = intercept[Exception] {
      Seq((1L, "x", 1.0)).toDF("g", "id", "score")
        .groupBy("g").agg(TopKAgg(col("score"), col("id"), 1)).collect()
    }
    assert(err.getMessage.contains("topk_agg expects"), err.getMessage)
  }

  test("registered via session extensions: usable from SQL, k must be literal") {
    graft.plans.GraftExtensions.register(spark)
    Seq((1L, 10L, 2.0), (1L, 11L, 3.0), (1L, 12L, 1.0))
      .toDF("g", "id", "score").createOrReplaceTempView("topk_test")
    val r = spark.sql(
      "SELECT g, topk_agg(score, id, 2) AS top FROM topk_test GROUP BY g")
      .select(explode(col("top.id"))).as[Long].collect().toSeq
    assert(r == Seq(11L, 10L))
  }

  test("heap bound holds under adversarial insertion order (property)") {
    val rnd = new scala.util.Random(42)
    val entries = Seq.tabulate(5000)(i => (rnd.nextInt(100).toDouble, i.toLong))
    val h = new TopKAgg.Heap(7)
    entries.foreach { case (s, i) => h.offer(s, i) }
    val got = h.sortedDesc().toSeq
    val want = entries
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      .take(7)
    assert(got == want)
    assert(h.size == 7)
  }
}
