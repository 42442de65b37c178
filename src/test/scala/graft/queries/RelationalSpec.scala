package graft.queries

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    // the query itself carries the 5% assertion as `sketch_ok`
    val rows = Relational.queries("q22_approx_distinct")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("sketch_ok"), r.toString))
    // and exact_parts really is the exact distinct count
    val exact = GraftSession.table(spark, Sf0001, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getAs[Long]("exact_parts") == exact(r.getString(0))))
  }

  test("unpivot emits 3 measures per group and inverts the wide shape") {
    val long = Relational.queries("q21_unpivot")(spark, Sf0001)
    val perGroup = long.groupBy("l_returnflag").count().collect()
    assert(perGroup.nonEmpty && perGroup.forall(_.getLong(1) == 3))
  }

  test("approx_percentile sketch within tolerance; exact median is exact") {
    val rows = Relational.queries("q27_approx_percentile")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("sketch_ok"), r.toString))
    val exact = GraftSession.table(spark, Sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val expected = math.round(exact(r.getString(0)) * 200)
      assert(r.getAs[Long]("p50_x200") == expected, r.toString)
    }
  }

  test("as-of join: every purchase timestamp is at or before its click") {
    val d = Relational.queries("q14_asof_join")(spark, Sf0001)
      .where(col("asof_purchase_ts").isNotNull)
    assert(d.where(col("asof_purchase_ts") > col("click_ts")).count() == 0)
    assert(d.count() > 0)
  }
}
