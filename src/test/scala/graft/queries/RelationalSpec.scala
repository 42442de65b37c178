package graft.queries

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val approx = Relational.queries("q22_approx_distinct")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = GraftSession.table(spark, Sf0001, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx=$a exact=$e")
    }
  }

  test("unpivot emits 3 measures per group and inverts the wide shape") {
    val long = Relational.queries("q21_unpivot")(spark, Sf0001)
    val perGroup = long.groupBy("l_returnflag").count().collect()
    assert(perGroup.nonEmpty && perGroup.forall(_.getLong(1) == 3))
  }

  test("approx_percentile within 2% of exact median per group") {
    val approx = Relational.queries("q27_approx_percentile")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = GraftSession.table(spark, Sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) / e < 0.02, s"$k: ${approx(k)} vs $e")
    }
  }

  test("as-of join: every purchase timestamp is at or before its click") {
    val d = Relational.queries("q14_asof_join")(spark, Sf0001)
      .where(col("asof_purchase_ts").isNotNull)
    assert(d.where(col("asof_purchase_ts") > col("click_ts")).count() == 0)
    assert(d.count() > 0)
  }
}
