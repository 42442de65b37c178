package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, Option("a"), Option(1.5)),
    (2L, Option("b"), None),
    (3L, None, Option(2.5)),
    (4L, Option("a"), Option(2.5))).toDF("id", "s", "v")

  test("profile counts rows, nulls, distincts, and renders min/max") {
    val p = Profiler.profile(sample)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    assert(p("v") == ((4L, 1L, 2L, "1.5", "2.5")))
  }

  test("approx profile matches exact counts on small data") {
    val exact = Profiler.profile(sample).orderBy("column_name")
      .select("column_name", "n_rows", "n_nulls", "min_str", "max_str").collect().toSeq
    val approx = Profiler.profile(sample, exact = false).orderBy("column_name")
      .select("column_name", "n_rows", "n_nulls", "min_str", "max_str").collect().toSeq
    assert(exact == approx) // everything but n_distinct is identical
    // HLL within its rsd at this cardinality: exact here
    val nd = Profiler.profile(sample, exact = false)
      .select("column_name", "n_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nd("id") == 4L && nd("s") == 2L)
  }

  test("column subset profiles only the requested columns") {
    val p = Profiler.profile(sample, cols = Seq("id"))
    assert(p.select("column_name").as[String].collect().toSeq == Seq("id"))
  }

  test("approx profile is a single-pass plan (no Expand)") {
    // exact multi-distinct expands the input k times; the sketch path
    // must stay a plain partial/final aggregate
    val plan = Profiler.profile(sample, exact = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile plan contains Expand:\n$plan")
  }

  test("correlation hits the closed forms: r=1 on a linear map, r=-1 negated, 0 on constant") {
    val d = Seq((1.0, 2.0, -2.0, 5.0), (2.0, 4.0, -4.0, 5.0),
      (3.0, 6.0, -6.0, 5.0), (4.0, 8.0, -8.0, 5.0))
      .toDF("x", "y2", "yn", "c")
    val r = Profiler.correlation(d, Seq("x" -> "y2", "x" -> "yn", "x" -> "c"))
      .collect().map(row => (row.getString(0), row.getString(1)) -> row.getDouble(3)).toMap
    assert(r(("x", "y2")) == 1.0)
    assert(r(("x", "yn")) == -1.0)
    assert(r(("x", "c")) == 0.0) // zero variance ⇒ 0 by convention, not NULL/NaN
  }

  test("correlation runs all pairs in one aggregation pass") {
    val d = Seq((1.0, 2.0, 3.0)).toDF("a", "b", "c")
    val plan = Profiler.correlation(d, Seq("a" -> "b", "b" -> "c", "a" -> "c"))
      .queryExecution.executedPlan.toString
    // one aggregate pair (partial+final), no join, no extra scans
    assert(!plan.contains("Join"), s"correlation plan joins:\n$plan")
  }
}
