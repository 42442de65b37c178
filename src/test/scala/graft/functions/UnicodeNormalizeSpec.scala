package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSpec {

  import spark.implicits._

  // decomposed: e + COMBINING ACUTE; composed: U+00E9
  private val decomposed = "cafe\u0301"
  private val composed = "caf\u00e9"

  test("NFC composes, NFD decomposes, NFKC folds compatibility forms") {
    val df = Seq(decomposed).toDF("s")
    val r = df.select(
      UnicodeNormalize(col("s"), "NFC").as("nfc"),
      UnicodeNormalize(col("s"), "NFD").as("nfd"),
      length(UnicodeNormalize(col("s"), "NFC")).as("ln")).head()
    assert(r.getString(0) == composed)
    assert(r.getString(1) == decomposed)
    assert(r.getInt(2) == 4)
    // NFKC folds the fi ligature to plain "fi"; NFC must NOT
    val lig = Seq("\uFB01sh").toDF("s").select(
      UnicodeNormalize(col("s"), "NFKC").as("nfkc"),
      UnicodeNormalize(col("s"), "NFC").as("nfc")).head()
    assert(lig.getString(0) == "fish" && lig.getString(1) == "\uFB01sh")
  }

  test("already-normalized ASCII passes through; null stays null") {
    val df = Seq(Some("plain ascii"), None).toDF("s")
    val r = df.select(UnicodeNormalize(col("s"), "NFC")).collect()
    assert(r(0).getString(0) == "plain ascii")
    assert(r(1).isNullAt(0))
  }

  test("registered via session extensions: usable from SQL; bad form rejected") {
    graft.plans.GraftExtensions.register(spark)
    Seq(decomposed).toDF("s").createOrReplaceTempView("un_test")
    val r = spark.sql("SELECT unicode_normalize(s, 'NFC') AS n FROM un_test")
      .as[String].head()
    assert(r == composed)
    val err = intercept[Exception] {
      spark.sql("SELECT unicode_normalize(s, 'NFX') FROM un_test").collect()
    }
    assert(err.getMessage.contains("unknown form"))
  }

  test("participates in whole-stage codegen (no fallback)") {
    // a '*(1) Project' plan string alone cannot catch a Janino failure
    // (Spark silently falls back to interpreted eval at runtime) \u2014
    // force CODEGEN_ONLY + fallback=false so a compile error SURFACES
    withSQLConf(
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      val d = spark.range(100)
        .select(concat(lit("row \u00e9 "), col("id").cast("string")).as("s"))
        .select(UnicodeNormalize(col("s"), "NFC").as("n"))
      val plan = d.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project") && plan.contains("unicode_normalize"), plan)
      assert(d.where(col("n").contains("\u00e9")).count() == 100)
    }
  }

  test("pure-ASCII byte-scan fast path returns the input object; non-ASCII normalized forms correct") {
    import org.apache.spark.unsafe.types.UTF8String
    import java.text.Normalizer
    val ascii = UTF8String.fromString("plain ascii 123 !@#")
    // reference identity: the ASCII short-circuit must not allocate
    assert(UnicodeNormalize.norm(ascii, Normalizer.Form.NFKD) eq ascii)
    val dec = UTF8String.fromString(decomposed)
    assert(UnicodeNormalize.norm(dec, Normalizer.Form.NFD) eq dec) // already NFD
    assert(UnicodeNormalize.norm(dec, Normalizer.Form.NFC).toString == composed)
    // multi-byte boundary: a non-ASCII byte anywhere defeats the scan
    val tail = UTF8String.fromString("x" * 50 + decomposed)
    assert(UnicodeNormalize.norm(tail, Normalizer.Form.NFC).toString ==
      "x" * 50 + composed)
  }
}
