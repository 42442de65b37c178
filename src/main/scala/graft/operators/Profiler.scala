package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level data-quality profile — the natural companion to the
  * diff engine (the reference compares datasets; profiling is the
  * "what am I even looking at" step that precedes a compare, and the
  * first thing a 100 TB training-data pipeline runs on a new drop).
  *
  * Output is LONG format — one row per column:
  * (column_name, n_rows, n_nulls, n_distinct, min_str, max_str) —
  * so the profile of a 1000-column table is 1000 rows, not a
  * 6000-column monster row, and two profiles can be diffed with the
  * comparator itself.
  *
  * Scale design: everything is ONE global aggregation. With
  * `exact = true` the multi-column COUNT(DISTINCT)s make Catalyst
  * expand the input k× before the shuffle — fine at gate scale and
  * oracle-exact, but at 100 TB use `exact = false`: the HLL sketch
  * (±~2.3%) keeps the plan a genuine single pass with map-side
  * partial aggregation and O(k) state per partition (same trade as
  * q22_approx_distinct).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String] = Nil, exact: Boolean = true): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = names.flatMap { n =>
      val c = col(n)
      Seq(
        count(lit(1)).as(s"__rows_$n"),
        count(c).as(s"__nonnull_$n"),
        // rsd 0.01 (not the 0.05 default): ~1% expected error keeps a
        // 5% accuracy contract with real margin at any cardinality,
        // for 4× sketch state — still O(kB) per column
        (if (exact) count_distinct(c) else approx_count_distinct(c, 0.01)).as(s"__nd_$n"),
        min(c).cast("string").as(s"__min_$n"),
        max(c).cast("string").as(s"__max_$n"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = names.map { n =>
      struct(lit(n).as("column_name"),
        col(s"__rows_$n").as("n_rows"),
        (col(s"__rows_$n") - col(s"__nonnull_$n")).as("n_nulls"),
        col(s"__nd_$n").as("n_distinct"),
        col(s"__min_$n").as("min_str"),
        col(s"__max_$n").as("max_str"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  // ---------------------------------------------------------------- gate

  private val OrdersCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_profile" -> ((s, dir) =>
      profile(table(s, dir, "orders")).orderBy("column_name")),

    // The 100 TB path (exact=false): HLL sketches keep the profile a
    // genuine single pass with O(k) state. The sketch estimate is
    // engine-private, so — like q22_approx_distinct — the gate row
    // carries the EXACT distinct count plus a `sketch_ok` bit
    // asserting the HLL estimate landed within 5% of it: hash-
    // matchable cross-engine while still executing the sketch path.
    "dq_profile_approx" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val approx = profile(o, exact = false)
        .select(col("column_name"), col("n_distinct").as("nd_approx"))
      profile(o)
        .join(approx, Seq("column_name"))
        .select(col("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"),
          (abs(col("nd_approx").cast("double") - col("n_distinct")) / col("n_distinct") <= 0.05)
            .as("sketch_ok"))
        .orderBy("column_name")
    }))

  private def profileSql(select: String): String =
    OrdersCols.map { c =>
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         | COUNT(*) - COUNT($c) AS n_nulls,
         | COUNT(DISTINCT $c) AS n_distinct,
         | CAST(MIN($c) AS VARCHAR) AS min_str,
         | CAST(MAX($c) AS VARCHAR) AS max_str FROM orders""".stripMargin
    }.mkString(s"SELECT $select FROM (\n", "\nUNION ALL\n", "\n) ORDER BY column_name")

  def oracles: Map[String, String] = Map(
    "dq_profile" -> profileSql("*"),
    "dq_profile_approx" -> profileSql(
      "column_name, n_rows, n_nulls, n_distinct, TRUE AS sketch_ok"))
}
