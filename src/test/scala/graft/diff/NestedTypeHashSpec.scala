package graft.diff

import graft.SparkSpec
import graft.canon.Canonicalizer
import org.apache.spark.sql.types._

/** Regression tests for nested complex-type hashing in the comparator
  * (advisor round-2 findings): xxhash64 skips nulls at every nesting
  * level, so rows differing only in null PLACEMENT inside an array or
  * struct must still be detected; and xxhash64 rejects MapType
  * recursively, so nested maps must not make compare() throw.
  */
class NestedTypeHashSpec extends SparkSpec {
  import spark.implicits._

  private val opts = CompareOptions(numBuckets = 16)

  test("array null-placement difference is detected: ['x',null] vs [null,'x']") {
    val src = Seq((1, Seq[String]("x", null))).toDF("id", "a")
    val tgt = Seq((1, Seq[String](null, "x"))).toDF("id", "a")
    val rep = Comparator.compare(src, tgt, opts)
    assert(!rep.identical)
    assert(rep.orphanSrc == 1 && rep.orphanTgt == 1)
  }

  test("trailing array null is detected: ['x'] vs ['x',null]") {
    val src = Seq((1, Seq[String]("x"))).toDF("id", "a")
    val tgt = Seq((1, Seq[String]("x", null))).toDF("id", "a")
    val rep = Comparator.compare(src, tgt, opts)
    assert(!rep.identical)
  }

  test("struct field null-placement difference is detected") {
    val src = Seq((1, ("x", null: String))).toDF("id", "s")
    val tgt = Seq((1, (null: String, "x"))).toDF("id", "s")
    val rep = Comparator.compare(src, tgt, opts)
    assert(!rep.identical)
  }

  test("nested map column (array<map>) compares without throwing") {
    val src = Seq((1, Seq(Map("k" -> 1)))).toDF("id", "m")
    val tgt = Seq((1, Seq(Map("k" -> 2)))).toDF("id", "m")
    assert(Comparator.compare(src, src, opts).identical)
    assert(!Comparator.compare(src, tgt, opts).identical)
  }

  test("struct-wrapped map column compares without throwing") {
    val src = Seq((1, (7, Map("k" -> 1)))).toDF("id", "s")
    assert(Comparator.compare(src, src, opts).identical)
  }

  test("needsJsonHash routes on type SHAPE only, never nullability metadata") {
    // complex types always route through JSON — regardless of flags
    assert(Canonicalizer.needsJsonHash(ArrayType(StringType, containsNull = true)))
    assert(Canonicalizer.needsJsonHash(ArrayType(StringType, containsNull = false)))
    assert(Canonicalizer.needsJsonHash(MapType(StringType, LongType)))
    assert(Canonicalizer.needsJsonHash(
      StructType(Seq(StructField("a", LongType, nullable = false)))))
    // atomic types never route through JSON
    assert(!Canonicalizer.needsJsonHash(StringType))
    assert(!Canonicalizer.needsJsonHash(DecimalType(12, 2)))
    assert(!Canonicalizer.needsJsonHash(TimestampType))
  }

  test("identical data with different containsNull flags hashes equal") {
    import org.apache.spark.sql.Row
    val data = java.util.Arrays.asList(Row(1L, Seq("x", "y")))
    def df(cn: Boolean) = spark.createDataFrame(data,
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("a", ArrayType(StringType, containsNull = cn)))))
    val rep = Comparator.compare(df(true), df(false), opts)
    assert(rep.identical, "equal values must hash equal across nullability metadata")
  }

  test("top-level map entry order is not identity") {
    import org.apache.spark.sql.functions._
    val a = Seq(1).toDF("id")
      .select(col("id"), map(lit("a"), lit(1), lit("b"), lit(2)).as("m"))
    val b = Seq(1).toDF("id")
      .select(col("id"), map(lit("b"), lit(2), lit("a"), lit(1)).as("m"))
    val c = Seq(1).toDF("id")
      .select(col("id"), map(lit("a"), lit(1), lit("b"), lit(3)).as("m"))
    assert(Comparator.compare(a, b, opts).identical)
    assert(!Comparator.compare(a, c, opts).identical)
  }
}
