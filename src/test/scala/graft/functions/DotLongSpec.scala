package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotLongSpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
    (Seq(-2L, 7L), Seq(3L, 3L)),
    (Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")

  test("matches the composable HOF form exactly") {
    val native = df.select(DotLong(col("a"), col("b"))).as[Long].collect()
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (s, v) => s + v))
      .as[Long].collect()
    assert(native.toSeq == hof.toSeq)
    assert(native.toSeq == Seq(32L, 15L, 0L))
  }

  test("null in either side gives null") {
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = n.select(DotLong(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("registered via session extensions: usable from SQL") {
    graft.plans.GraftExtensions.register(spark)
    df.createOrReplaceTempView("dot_test")
    val r = spark.sql("SELECT dot_long(a, b) AS d FROM dot_test ORDER BY d")
      .as[Long].collect()
    assert(r.toSeq == Seq(0L, 15L, 32L))
  }

  test("participates in whole-stage codegen (no fallback)") {
    // a local literal table constant-folds away; use range so a real
    // codegen stage materializes
    val d = spark.range(100)
      .select(array(col("id"), col("id") + 1).as("a"), array(col("id"), col("id")).as("b"))
      .select(DotLong(col("a"), col("b")).as("d"))
    // the `*(n)` prefix marks a WholeStageCodegen stage containing the
    // projection — i.e. no interpreted fallback
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("dot_long"), plan)
    assert(d.agg(sum("d")).head().getLong(0) ==
      (0L until 100L).map(i => i * i + (i + 1) * i).sum)
  }
}
