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

  test("transitions: per-from probabilities sum to 1, counts conserve the sequence length") {
    val r = Relational.queries("q38_transitions")(spark, Sf0001).collect()
    assert(r.nonEmpty)
    // each from_type's probability column is a distribution
    r.groupBy(_.getString(0)).foreach { case (from, rows) =>
      val psum = rows.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-9, s"$from distribution sums to $psum")
      rows.foreach(x => assert(x.getDouble(3) > 0 && x.getDouble(3) <= 1.0))
    }
    // total transition count = total events - one per user (no lead on last)
    val ev = graft.GraftSession.table(spark, Sf0001, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(r.map(_.getLong(2)).sum == expected)
  }

  test("funnel: step counts monotonically shrink and order matters") {
    val r = Relational.queries("q35_funnel")(spark, Sf0001).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel must shrink: $v >= $c >= $p")
    assert(v > 0)
    // order-blind step-2 count (any view AND any click, regardless of
    // sequence) must be >= the ordered count — the window frame is
    // enforcing "click strictly after first view", not co-occurrence
    val ev = graft.GraftSession.table(spark, Sf0001, "events")
    val unordered = ev.groupBy(col("user_id"))
      .agg(max(col("event_type") === "view").as("hv"),
        max(col("event_type") === "click").as("hc"))
      .where(col("hv") && col("hc")).count()
    assert(unordered >= c)
  }

  test("attribution: every purchase credited exactly once, cents conserved") {
    val ev = graft.GraftSession.table(spark, Sf0001, "events")
      .where(col("event_type") === "purchase")
    val expectedN = ev.count()
    val expectedCents = ev
      .agg(sum(round(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    val attr = Relational.queries("q37_attribution")(spark, Sf0001).collect()
    assert(attr.map(_.getLong(1)).sum == expectedN)
    assert(attr.map(_.getLong(2)).sum == expectedCents)
    // first_type is never null: a user's first event always opens a session
    assert(attr.forall(!_.isNullAt(0)))
  }

  test("retention: offset-0 count equals cohort size, actives never exceed it") {
    val d = Relational.queries("q36_retention")(spark, Sf0001)
    val day0 = d.where(col("offset_days") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    // every cohort has an offset-0 row (each user is active on their
    // own first day by construction)
    val cohorts = d.select("cohort_day").distinct().count()
    assert(day0.count() == cohorts)
    val violations = d.join(day0, "cohort_day")
      .where(col("n_users") > col("cohort_size")).count()
    assert(violations == 0, "a later offset retained more users than the cohort has")
    assert(d.where(col("offset_days") < 0).count() == 0)
  }

  test("scd2: runs collapse consecutive types, intervals chain, exactly one current per user") {
    val h = Relational.queries("q44_scd2")(spark, Sf0001)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("run_seq"))
    // adjacent runs never share a type (otherwise they'd be one run)
    assert(h.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type") === col("event_type")).count() == 0)
    // each run's valid_to equals the next run's valid_from; only the
    // last run per user is open — so exactly one current row per user
    assert(h.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .where((col("valid_to").isNotNull || col("next_from").isNotNull) &&
        !(col("valid_to") <=> col("next_from"))).count() == 0)
    val users = h.select("user_id").distinct().count()
    assert(h.where(col("is_current")).count() == users)
    // events conserve: run sizes sum to the event count
    val evs = GraftSession.table(spark, Sf0001, "events").count()
    assert(h.agg(sum("n_events")).head().getLong(0) == evs)
    // hand case: A A B A collapses to runs (A,2)(B,1)(A,1)
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    Seq((9001L, t(0), 1L, "A"), (9001L, t(1), 2L, "A"),
      (9001L, t(2), 3L, "B"), (9001L, t(3), 4L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .createOrReplaceTempView("scd2_hand")
    // replay the same operator inline over the hand data
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runs = spark.table("scd2_hand")
      .withColumn("changed", when(lag(col("event_type"), 1).over(byUser).isNull ||
        lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_seq",
        sum(col("changed")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "run_seq")
      .agg(min("event_type").as("event_type"), count(lit(1)).as("n_events"))
      .orderBy("run_seq").collect()
    assert(runs.map(r => (r.getString(2), r.getLong(3))).toSeq ==
      Seq(("A", 2L), ("B", 1L), ("A", 1L)))
  }
}
