package graft.functions

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

class ParitySpec extends SparkSpec {

  import spark.implicits._

  test("pgRecordText: quoting, NULL-as-empty, parens") {
    val df = Seq(
      (1L, Some("plain"), Some("x")),
      (2L, Some("has space"), None),
      (3L, None: Option[String], Some("y"))).toDF("id", "s", "t")
    val recs = df.select(col("id"), Parity.pgRecordText(df).as("r"))
      .orderBy("id").as[(Long, String)].collect().map(_._2)
    assert(recs(0) == "(1,plain,x)")
    assert(recs(1) == "(2,\"has space\",)")
    assert(recs(2) == "(3,,y)")
  }

  test("chainedMd5 matches a hand-computed serial fold") {
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02X".format(_)).mkString
    }
    val rows = Seq(("b1", "alpha"), ("b1", "beta"), ("b2", "gamma"))
    val expectedB1 = md5hex(md5hex("" + "alpha") + "beta") // sorted order alpha<beta
    val expectedB2 = md5hex("" + "gamma")
    val df = rows.toDF("bucket", "canon")
    val out = Parity.chainedMd5(df, col("bucket"), col("canon"))
      .orderBy("bucket").as[(String, String)].collect().toMap
    assert(out("b1") == expectedB1)
    assert(out("b2") == expectedB2)
  }

  test("chainedMd5 is invariant under input partitioning and row order") {
    val li = GraftSession.table(spark, Sf0001, "lineitem").limit(500)
    val canon = Parity.pgRecordText(li, Seq("l_orderkey", "l_linenumber", "l_returnflag"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Parity.chainedMd5(df, substring(md5(Parity.pgRecordText(df,
        Seq("l_orderkey", "l_linenumber", "l_returnflag"))), 1, 1),
        Parity.pgRecordText(df, Seq("l_orderkey", "l_linenumber", "l_returnflag")))
        .orderBy("bucket").as[(String, String)].collect().toSeq
    val a = run(li.repartition(7))
    val b = run(li.orderBy(desc("l_orderkey")).repartition(2))
    assert(a == b && a.nonEmpty)
  }

  test("sortedMd5 streaming fold equals the collect_list+array_sort form") {
    val li = GraftSession.table(spark, Sf0001, "lineitem").limit(800)
    val c = li.select(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag")).as("canon"))
    val streamed = Parity
      .sortedMd5(c, substring(md5(col("canon")), 1, 1), col("canon"))
      .orderBy("bucket").as[(String, String, Long)].collect().toSeq
    val collected = c
      .withColumn("bucket", substring(md5(col("canon")), 1, 1))
      .groupBy("bucket")
      .agg(md5(concat_ws("\n", array_sort(collect_list(col("canon"))))).as("fingerprint"),
        count(lit(1)).as("n"))
      .orderBy("bucket").as[(String, String, Long)].collect().toSeq
    assert(streamed == collected && streamed.nonEmpty)
  }

  test("sortedMd5 is invariant under input partitioning and row order") {
    val li = GraftSession.table(spark, Sf0001, "lineitem").limit(500)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val c = df.select(concat_ws("|", col("l_orderkey"), col("l_linenumber")).as("canon"))
      Parity.sortedMd5(c, substring(md5(col("canon")), 1, 1), col("canon"))
        .orderBy("bucket").as[(String, String, Long)].collect().toSeq
    }
    val a = run(li.repartition(7))
    val b = run(li.orderBy(desc("l_orderkey")).repartition(2))
    assert(a == b && a.nonEmpty)
  }

  test("compareAuto plans buckets from row counts and still detects the mutation") {
    val li = GraftSession.table(spark, Sf0001, "lineitem")
    val rep = graft.diff.Comparator.compareAuto(
      li, graft.queries.CompareQueries.mutated(li), targetRowsPerBucket = 100)
    assert(rep.orphanSrc == 1 && rep.orphanTgt == 1)
    assert(rep.totalBuckets >= 60) // 6000 rows / 100 per bucket
  }
}
