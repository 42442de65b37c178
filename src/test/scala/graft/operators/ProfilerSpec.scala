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

  test("histogram drift: hand-computed counts, cross deltas and TVD; identical snapshots drift 0") {
    // A: 3 rows in bucket 0, 1 in bucket 1 (N_a=4)
    // B: 1 row  in bucket 0, 1 in bucket 1, 2 in bucket 2 (N_b=4)
    val a = Seq(1.0, 2.0, 3.0, 15.0).toDF("v")
    val b = Seq(4.0, 12.0, 25.0, 27.0).toDF("v")
    val d = Profiler.histogramDrift(a, b, "v", 0.0, 30.0, 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDecimal(3).longValueExact())).toMap
    assert(d(0L) == ((3L, 1L, 8L)))  // |3*4 - 1*4|
    assert(d(1L) == ((1L, 1L, 0L)))
    assert(d(2L) == ((0L, 2L, 8L)))  // bucket only on the B side
    // TVD = (8+0+8) / (2*4*4) = 0.5 — exactly half the mass moved
    val tvd = Profiler.histogramDriftTvd(a, b, "v", 0.0, 30.0, 3)
      .head().getDouble(0)
    assert(tvd == 0.5)
    // identical snapshots: zero drift
    assert(Profiler.histogramDriftTvd(a, a, "v", 0.0, 30.0, 3).head().getDouble(0) == 0.0)
  }

  test("winsorize: hand-computed fences and clip counts on 1..100, masses conserved") {
    import spark.implicits._
    val d = (1 to 100).map(_.toDouble).toDF("x")
    val r = Profiler.winsorize(d, "x", 0.05, 0.95).head()
    // interpolated exact percentiles: 1 + 0.05*99 and 1 + 0.95*99
    assert(r.getDouble(0) == 5.95 && r.getDouble(1) == 95.05)
    assert(r.getLong(2) == 5 && r.getLong(3) == 5 && r.getLong(4) == 90)
    // kept mass: 6..95 inclusive
    assert(r.getDouble(5) == (6 to 95).sum.toDouble)
    // degenerate distribution: nothing clips
    val const = Seq.fill(50)(7.0).toDF("x")
    val rc = Profiler.winsorize(const, "x", 0.01, 0.99).head()
    assert(rc.getLong(2) == 0 && rc.getLong(3) == 0 && rc.getLong(4) == 50)
  }

  test("profile diff: identical snapshots agree everywhere, a mutation shows per-column") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, null.asInstanceOf[String])).toDF("id", "s")
    val same = Profiler.profileDiff(a, a).collect()
    assert(same.length == 2)
    same.foreach { r =>
      assert(r.getLong(1) == r.getLong(2))  // n_rows
      assert(r.getLong(3) == r.getLong(4))  // n_nulls
      assert(r.getLong(5) == r.getLong(6))  // n_distinct
      assert(r.getBoolean(7))               // bounds_equal
    }
    val b = Seq((1L, "x"), (2L, "z"), (4L, "y")).toDF("id", "s")
    val diff = Profiler.profileDiff(a, b).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!diff("id").getBoolean(7))                      // max 3 vs 4
    assert(diff("s").getLong(3) == 1 && diff("s").getLong(4) == 0) // null gone
  }

  test("functional dependencies: held FD vs violated FD with exact fan-out") {
    import spark.implicits._
    val d = Seq((1, "a", "x"), (2, "a", "y"), (3, "b", "z"), (4, "b", "z"))
      .toDF("id", "k", "v")
    val r = Profiler.functionalDependencies(d, Seq("id" -> "v", "k" -> "v"))
      .orderBy("determinant").collect()
    val byDet = r.map(x => x.getString(0) ->
      (x.getLong(2), x.getLong(3), x.getLong(4), x.getBoolean(5))).toMap
    assert(byDet("id") == ((4L, 0L, 1L, true)))   // key FD holds
    assert(byDet("k") == ((2L, 1L, 2L, false)))   // "a" -> {x,y} violates
  }

  test("daily anomalies: hand-computed z on a planted spike; flat and 1-day histories score 0") {
    import spark.implicits._
    import java.sql.Timestamp
    // type "a": 1 event/day for 9 days then a 6-event spike on day 10
    // (counts 1×9, 6: mean 1.5, sample var 2.5, z = 4.5/sqrt(2.5) ≈ 2.85)
    // type "b": perfectly flat (sd 0 -> z 0); type "c": one day only
    val rows =
      (1 to 9).map(d => (Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"), "a")) ++
        (1 to 6).map(_ => (Timestamp.valueOf("2024-01-10 10:00:00"), "a")) ++
        (1 to 3).map(d => (Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"), "b")) ++
        Seq((Timestamp.valueOf("2024-01-01 10:00:00"), "c"))
    val df = rows.toDF("ts", "event_type")
    val r = Profiler.dailyAnomalies(df, col("ts"), col("event_type"))
      .orderBy("key", "day").collect()
    val a10 = r.filter(x => x.getString(0) == "a" && x.getLong(2) == 6).head
    assert(a10.getDouble(3) == 1.5)
    assert(a10.getDouble(4) == math.sqrt(2.5))
    assert(a10.getDouble(5) == 4.5 / math.sqrt(2.5))
    assert(a10.getBoolean(6))
    // the 9 quiet days of "a" sit below the threshold
    assert(r.count(x => x.getString(0) == "a" && x.getBoolean(6)) == 1)
    val flatZ = r.filter(_.getString(0) == "b").map(_.getDouble(5)).toSeq
    assert(flatZ == Seq(0.0, 0.0, 0.0))
    val c = r.filter(_.getString(0) == "c").head
    assert(c.getDouble(4) == 0.0 && c.getDouble(5) == 0.0 && !c.getBoolean(6))
  }

  test("referential integrity: orphan keys and rows counted exactly") {
    import spark.implicits._
    val child = Seq((1, "a"), (1, "b"), (2, "c"), (9, "d"), (9, "e")).toDF("fk", "v")
    val parent = Seq(1, 2, 3).toDF("pk")
    val r = Profiler.referentialIntegrity(
      Seq(("child -> parent", child, col("fk"), parent, col("pk")))).head()
    assert(r.getString(0) == "child -> parent")
    assert(r.getLong(1) == 3 && r.getLong(2) == 1 && r.getLong(3) == 2)
    assert(!r.getBoolean(4)) // key 9 (2 rows) is orphaned
  }

  test("constraint candidates: unique needs all-distinct AND no nulls") {
    import spark.implicits._
    val d = Seq((Some(1), Some("a"), Some("x")), (Some(2), Some("a"), None),
      (Some(3), Some("b"), Some("y"))).toDF("id", "grp", "opt")
    val r = Profiler.constraintCandidates(d).collect()
      .map(x => x.getString(0) -> (x.getBoolean(1), x.getBoolean(2))).toMap
    assert(r("id") == ((true, true)))    // unique + not null
    assert(r("grp") == ((false, true)))  // duplicates
    assert(r("opt") == ((false, false))) // distinct but nullable
  }

  test("join cardinality: exact sum of per-key products without running the join") {
    import spark.implicits._
    val a = Seq(1, 1, 1, 2, 3).toDF("k")      // histogram 1->3, 2->1, 3->1
    val b = Seq(1, 1, 2, 9).toDF("k")         // histogram 1->2, 2->1, 9->1
    val r = Profiler.joinCardinality(a, col("k"), b, col("k")).head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 4)
    assert(r.getDecimal(2).longValue == 7)    // 3*2 + 1*1
    assert(r.getDecimal(3).longValue == 6)    // hottest key 1
    // ground truth: the actual join
    assert(a.join(b, "k").count() == 7)
  }

  test("json schema profile: dynamic keys, value-shape types, mixed-type drift visible") {
    import spark.implicits._
    val d = Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2, "c": true}""",
      """{"a": "oops"}""", // the int->string drift row
      "not json at all").toDF("j")
    val r = Profiler.jsonSchemaProfile(d, col("j"))
      .orderBy("key", "vtype").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(r == Seq(("a", "int", 2L), ("a", "string", 1L),
      ("b", "string", 1L), ("c", "bool", 1L)))
  }

  test("quantile drift: identical snapshots show zero delta and a passing sketch bit") {
    import spark.implicits._
    val d = (1 to 100).map(_.toDouble).toDF("x")
    val r = Profiler.quantileDrift(d, d, "x").orderBy("quantile").collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(0.5, 0.9, 0.99))
    r.foreach { row =>
      assert(row.getDouble(1) == row.getDouble(2))
      assert(row.getDouble(3) == 0.0)
      assert(row.getBoolean(4), "sketch disagreed with exact beyond 5%")
    }
    // a planted tail shift moves p99 but not p50
    val shifted = d.withColumn("x", when(col("x") > 98, col("x") * 10).otherwise(col("x")))
    val s = Profiler.quantileDrift(d, shifted, "x").orderBy("quantile").collect()
    assert(s(0).getDouble(3) == 0.0 && s(2).getDouble(3) > 0.0)
  }

  test("ks drift: hand-computed exact statistic, argmin tie-break, width-invariant") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0).toDF("x")
    val b = Seq(3.0, 4.0, 5.0).toDF("x")
    // gaps (|c_a*3 - c_b*3|): v=1 -> 3, v=2 -> 6, v=3 -> 6, v=4 -> 3,
    // v=5 -> 0; max 6 attained at v=2 and v=3, argmin picks 2
    val r = Profiler.ksDrift(a, b, "x", bucketWidth = 2.0).head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getLong(2) == 666666L) // 6 * 1e6 div 9
    assert(r.getDouble(3) == 2.0)
    // the bucket-offset decomposition is an implementation detail:
    // any width gives the same statistic
    for (w <- Seq(0.5, 1.0, 100.0)) {
      val rw = Profiler.ksDrift(a, b, "x", bucketWidth = w).head()
      assert((rw.getLong(2), rw.getDouble(3)) == ((666666L, 2.0)), s"width $w")
    }
    // identical inputs: zero statistic, argmin = smallest value
    val same = Profiler.ksDrift(a, a, "x", bucketWidth = 2.0).head()
    assert(same.getLong(2) == 0L && same.getDouble(3) == 1.0)
    // disjoint supports: KS = 1 (1e6 ppm) exactly
    val c = Seq(10.0, 11.0).toDF("x")
    assert(Profiler.ksDrift(a, c, "x", bucketWidth = 2.0).head().getLong(2)
      == 1000000L)
  }

  test("key skew: exact ppm shares and hotness-vs-uniform, deterministic ties") {
    import spark.implicits._
    val d = (Seq.fill(6)("hot") ++ Seq("a", "a", "b", "c")).toDF("k")
    val r = Profiler.keySkew(d, col("k"), topK = 3).collect()
    // 10 rows, 4 distinct keys; tie between b and c broken by key asc
    assert(r.map(_.getString(0)).toSeq == Seq("hot", "a", "b"))
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) == ((6L, 600000L, 2400L)))
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3)) == ((2L, 200000L, 800L)))
  }

  test("weekly profile: known timestamps land in the right (dow, hour) cells") {
    import spark.implicits._
    // 2026-08-14 is a Friday (EXTRACT(DOW) = 5); 2026-08-16 a Sunday (0)
    val d = Seq(
      java.sql.Timestamp.valueOf("2026-08-14 10:15:00"),
      java.sql.Timestamp.valueOf("2026-08-14 10:45:00"),
      java.sql.Timestamp.valueOf("2026-08-16 23:05:00"),
      java.sql.Timestamp.valueOf("2026-08-17 00:00:00")) // Monday = 1
      .toDF("ts")
    val r = Profiler.weeklyProfile(d, col("ts")).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r == Map(
      (5L, 10L) -> ((2L, 500000L)),
      (0L, 23L) -> ((1L, 250000L)),
      (1L, 0L) -> ((1L, 250000L))))
  }

  test("group quantiles: per-group exact percentiles in one pass") {
    import spark.implicits._
    val d = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i * 10.0))).toDF("g", "x")
    val r = Profiler.groupQuantiles(d, col("g"), "x", Seq(0.5, 0.9)).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    // exact interpolated percentiles — the p90 literal is the IEEE
    // value of 90 + 0.1·(91−90), which is not decimal 90.1
    assert(r("a") == ((50.5, 90.10000000000001)))
    assert(r("b") == ((55.0, 91.0)))
  }

  test("null patterns: correlated nulls surface as their own pattern row") {
    import spark.implicits._
    val d = Seq(
      (Option(1), Option("x")), (Option(2), Option("y")),
      (None: Option[Int], None: Option[String]),   // correlated pair
      (None: Option[Int], None: Option[String]),
      (Option(5), None: Option[String]))           // independent drip
      .toDF("a", "b")
    val r = Profiler.nullPatterns(d, Seq("a", "b")).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(
      "00" -> ((2L, 400000L)),
      "11" -> ((2L, 400000L)),
      "01" -> ((1L, 200000L))))
  }

  test("benford: exact first-digit counts, sub-1 values excluded, ppm arithmetic") {
    import spark.implicits._
    val d = Seq(1.5, 19.0, 123.0, 2.0, 0.4, -3.0, 900.0, 1000.0).toDF("x")
    // digits: 1(1.5), 1(19), 1(123), 2(2.0), 3(|-3|), 9(900), 1(1000); 0.4 excluded
    val r = Profiler.benford(d, "x").orderBy("digit").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r.keySet == Set(1L, 2L, 3L, 9L))
    assert(r(1L)._1 == 4L && r(1L)._2 == 4L * 1000000L / 7L)
    assert(r(2L)._1 == 1L && r(2L)._3 == 176091L)
    assert(r(9L)._1 == 1L && r(9L)._4 ==
      math.abs(1000000L / 7L - 45757L))
  }

  test("benford: values at or above 2^63 are excluded (long-cast saturation guard)") {
    import spark.implicits._
    // 1e19 > 2^63 would saturate floor(x).cast(long) to Long.MaxValue
    // under non-ANSI Spark (digit misread as 9) and ERROR under ANSI /
    // DuckDB — the guard excludes it; 9.2e18 (< 2^63) still counts
    val d = Seq(1e19, 9.2e18, 5.0, Double.PositiveInfinity, Double.NaN).toDF("x")
    val r = Profiler.benford(d, "x").orderBy("digit").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(5L -> 1L, 9L -> 1L))
  }

  test("equi-depth histogram: near-equal bucket masses, ordered realized bounds") {
    import spark.implicits._
    // heavily skewed: fixed-bound buckets would pile everything left
    val d = ((1 to 700).map(_.toDouble) ++ (1 to 100).map(_ * 1000.0)).toDF("x")
    val r = Profiler.histogramEquiDepth(d, "x", 8).orderBy("bucket").collect()
    assert(r.map(_.getLong(0)).toSeq == (0 until 8).map(_.toLong))
    assert(r.map(_.getLong(1)).sum == 800L)
    val sizes = r.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 2, sizes.mkString(","))   // ~n/8 each
    // realized bounds are increasing and non-overlapping
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2))
    }
  }

  test("keySkew sketch twin: exact values identical, CMS estimate inside its guarantee") {
    import spark.implicits._
    val d = ((1 to 600).map(_ => "hot") ++ (1 to 400).map(i => s"k${i % 50}")).toDF("k")
    val exact = Profiler.keySkew(d, col("k"), topK = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sk = Profiler.keySkewSketch(d, col("k"), topK = 5).collect()
    assert(sk.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == exact.toSeq)
    assert(sk.forall(_.getBoolean(4)), "CMS estimate escaped its eps*N bound")
  }

  test("joinCardinality sketch twin: exact histogram columns identical, inner product bounded") {
    import spark.implicits._
    val a = (1 to 2000).map(i => i % 97).toDF("k")
    val b = (1 to 1500).map(i => i % 61).toDF("k")
    val ex = Profiler.joinCardinality(a, col("k"), b, col("k")).head()
    val r = Profiler.joinCardinalitySketch(a, col("k"), b, col("k")).head()
    assert(r.getLong(0) == ex.getLong(0) && r.getLong(1) == ex.getLong(1))
    assert(r.getLong(2) == ex.getDecimal(2).longValue)
    assert(r.getLong(3) == ex.getDecimal(3).longValue)
    assert(r.getBoolean(4), "CMS inner product escaped its 3*N_a*N_b/width bound")
    assert(a.join(b, "k").count() == r.getLong(2)) // ground truth
  }

  test("mad outliers: hand-computed fence flags only the planted outlier") {
    import spark.implicits._
    val d = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("x")
    val r = Profiler.madOutliers(d, "x").head()
    // median 3; devs {2,1,0,1,97} -> mad 1; only 97 > 3*mad
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 1.0)
    assert(r.getLong(2) == 5 && r.getLong(3) == 1)
  }

  test("mad sketch twin: approx passes agree on small data, sketch_ok true") {
    import spark.implicits._
    val d = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("x")
    val a = Profiler.madOutliersApprox(d, "x").head()
    // at n=5 the sketch is exact: same fence, same flag count
    assert(a.getDouble(0) == 3.0 && a.getDouble(1) == 1.0 && a.getLong(3) == 1)
    val s = Profiler.madOutliersSketch(d, "x").head()
    assert(s.getDouble(0) == 3.0 && s.getDouble(1) == 1.0)
    assert(s.getLong(2) == 5 && s.getLong(3) == 1 && s.getBoolean(4))
  }

  test("dataset card: hand-computed headline numbers, top-source share") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b", "en", "s1"), (2L, "c", "en", "s1"), (3L, "d e f", "fr", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Profiler.datasetCard(d).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getLong(3) == 9 && r.getLong(4) == 6) // chars, tokens
    assert(r.getLong(5) == 3 && r.getLong(6) == 5) // mean, max chars
    assert(r.getString(7) == "s1" && r.getLong(8) == 2000000L / 3)
  }

  test("sequence gaps: planted gaps, duplicates and nulls all counted") {
    import spark.implicits._
    val d = Seq(Option(1L), Option(2L), Option(2L), Option(5L), None).toDF("k")
    val r = Profiler.sequenceGaps(d, "k").head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 4 && r.getLong(2) == 3)
    assert(r.getLong(3) == 1 && r.getLong(4) == 5) // span 1..5
    assert(r.getLong(5) == 1)                      // one NULL key
    assert(r.getLong(6) == 2)                      // 3 and 4 missing
    assert(r.getLong(7) == 1)                      // one duplicated key
  }

  test("freshness: lag vs the freshest key, stale flag at the bound, nulls excluded") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def t(secOff: Long) = new java.sql.Timestamp(t0.getTime + secOff * 1000)
    val d = Seq(
      ("a", Option(t(0))), ("a", Option(t(7200))),  // freshest key
      ("b", Option(t(3600))), ("b", Option.empty[java.sql.Timestamp]),
      ("c", Option(t(7199))))                       // 1s behind: not stale
      .toDF("k", "ts")
    val r = Profiler.freshness(d, col("k"), col("ts")).collect()
      .map(x => x.getString(0) -> (x.getLong(2), x.getLong(3), x.getBoolean(4)))
      .toMap
    assert(r("a") == ((2L, 0L, false)))
    assert(r("b") == ((1L, 3600L, true))) // null ts row not counted in n
    assert(r("c") == ((1L, 1L, false)))
  }

  test("freshness scans its input exactly once (corpus max never re-reads the raw table)") {
    import org.apache.spark.sql.functions.col
    // a real file source: a crossJoin'd re-aggregation reads the scan
    // twice and this count catches it
    val ev = graft.GraftSession.table(spark, Sf0001, "events")
    val out = Profiler.freshness(ev, col("event_type"), col("ts"))
    out.collect()
    // AQE's toString prints the final AND initial plans — count scans
    // in the final section only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") || l.contains("FileScan"))
    assert(scans == 1, s"expected ONE input scan, plan has $scans:\n${plan.take(2000)}")
    // and the corpus max rides a window over the key-grain frame, not
    // a join: no join node anywhere in this plan
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("concentration: hand-computed gini and top share; nulls are a value; constant column scores 0") {
    import spark.implicits._
    val d = Seq(("a", "k", Some(1)), ("a", "k", Some(2)),
      ("a", "k", None), ("b", "k", Some(2)))
      .toDF("cat", "const", "num")
    val r = Profiler.concentration(d, Seq("cat", "const", "num")).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))
      .toMap
    // cat: {a:3, b:1} -> gini = 1 - (9+1)/16 = 0.375, top share 750000
    assert(r("cat") == ((2L, 4L, 3L, 750000L, 0.375)))
    // constant column: gini exactly 0, share 1e6
    assert(r("const") == ((1L, 4L, 4L, 1000000L, 0.0)))
    // nulls count as a value: {1:1, 2:2, null:1} -> 1 - (1+4+1)/16
    assert(r("num") == ((3L, 4L, 2L, 500000L, 1.0 - 6.0 / 16.0)))
  }
}
