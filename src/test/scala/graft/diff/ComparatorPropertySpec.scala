package graft.diff

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants of the comparator over ScalaCheck-
  * generated data (fixed seeds — deterministic CI) — the test class
  * the reference lacks entirely (SURVEY §5: no property tests).
  */
class ComparatorPropertySpec extends SparkSpec {

  import spark.implicits._

  private val rowGen = for {
    id <- Gen.choose(0L, 1000L)
    s  <- Gen.oneOf("a", "b", "c", "", "x y", "\\N")
    d  <- Gen.choose(-1e6, 1e6)
  } yield (id, s, d)

  private val dataGen = Gen.listOfN(60, rowGen)

  private def sample(seed: Long): List[(Long, String, Double)] =
    dataGen.pureApply(Gen.Parameters.default, Seed(seed))

  test("property: diff(d, d) is empty for arbitrary data (incl. duplicates, empties, token-collision strings)") {
    (1L to 5L).foreach { seed =>
      val rows = sample(seed)
      val rep = Comparator.compare(
        rows.toDF("id", "s", "d"), rows.toDF("id", "s", "d"),
        CompareOptions(numBuckets = 16))
      assert(rep.identical, s"seed=$seed: ${rep.verdict}")
    }
  }

  test("property: dropping k distinct rows yields exactly k source orphans") {
    (1L to 5L).foreach { seed =>
      val rows = sample(seed)
      val k = 1 + (seed % 4).toInt
      val distinctRows = rows.distinct
      assert(distinctRows.size > k)
      // drop k distinct values entirely; keep duplicate multiplicity of the rest
      val dropped = distinctRows.take(k).toSet
      val keep = rows.filterNot(dropped)
      val rep = Comparator.compare(
        rows.toDF("id", "s", "d"), keep.toDF("id", "s", "d"),
        CompareOptions(numBuckets = 16))
      val expectedOrphans = rows.count(dropped) // all copies of dropped rows
      assert(rep.orphanSrc == expectedOrphans && rep.orphanTgt == 0,
        s"seed=$seed k=$k got ${rep.orphanSrc}/${rep.orphanTgt} want $expectedOrphans/0")
    }
  }

  test("property: diff is symmetric under side swap") {
    (1L to 5L).foreach { seed =>
      val a = sample(seed); val b = sample(seed + 100)
      val (da, db) = (a.toDF("id", "s", "d"), b.toDF("id", "s", "d"))
      val r1 = Comparator.compare(da, db, CompareOptions(numBuckets = 16))
      val r2 = Comparator.compare(db, da, CompareOptions(numBuckets = 16))
      assert(r1.orphanSrc == r2.orphanTgt && r1.orphanTgt == r2.orphanSrc, s"seed=$seed")
    }
  }

  test("property: orphan counts invariant under bucket count") {
    val rows = sample(7L)
    val tgt = (-1L, "mut", 0.0) :: rows.tail
    val counts = Seq(1, 7, 64, 1024).map { nb =>
      val rep = Comparator.compare(
        rows.toDF("id", "s", "d"), tgt.toDF("id", "s", "d"),
        CompareOptions(numBuckets = nb))
      (rep.orphanSrc, rep.orphanTgt)
    }
    assert(counts.distinct.size == 1, counts.toString)
    assert(counts.head._1 >= 1) // the replaced head row must surface
  }

  test("property: aligned compare of a frame vs itself plus extras is identical") {
    import org.apache.spark.sql.functions.{col, lit, upper}
    (1L to 5L).foreach { seed =>
      val df = sample(seed).toDF("id", "s", "d")
      // migration: column added, one column renamed (case-flipped too)
      val migrated = df
        .withColumnRenamed("s", "S_RENAMED")
        .withColumn("loaded_at", lit("2026"))
        .select(col("S_RENAMED"), col("loaded_at"), col("d"), col("id"))
      val (rep, srcOnly, tgtOnly) = Comparator.compareAligned(
        df, migrated, CompareOptions(numBuckets = 16),
        renames = Map("s" -> "s_renamed"))
      assert(rep.identical, s"seed=$seed: ${rep.verdict}")
      assert(srcOnly.isEmpty && tgtOnly == Seq("loaded_at"), s"seed=$seed")
      rep.release()
      // and a value perturbation in the RENAMED column still surfaces
      val bad = migrated.withColumn("S_RENAMED", upper(col("S_RENAMED")))
      val (rep2, _, _) = Comparator.compareAligned(
        df, bad, CompareOptions(numBuckets = 16),
        renames = Map("s" -> "s_renamed"))
      val changed = sample(seed).count(r => r._2 != r._2.toUpperCase)
      assert((rep2.orphanSrc > 0) == (changed > 0), s"seed=$seed")
      rep2.release()
    }
  }
}
