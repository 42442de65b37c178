package graft.diff

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted dataset fingerprints: compare a live dataset against a
  * stored snapshot WITHOUT rescanning the snapshot — at 100 TB the
  * stored side costs O(numBuckets) rows to read regardless of the
  * original data size. This generalizes the reference's transient
  * in-database hashes (recomputed per run,
  * /root/reference/scribedb/base.py:156-159) into a durable artifact:
  * nightly-snapshot drift detection reads yesterday's fingerprints,
  * never yesterday's data.
  *
  * The store records numBuckets; compare validates it so fingerprints
  * from different bucketings can't be silently cross-compared.
  */
object FingerprintStore {

  def write(df: DataFrame, numBuckets: Int, path: String): Unit =
    Comparator.fingerprints(Comparator.withBuckets(df, numBuckets))
      .withColumn("num_buckets", lit(numBuckets))
      .write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): (DataFrame, Int) = {
    val df = spark.read.parquet(path)
    val nb = df.select("num_buckets").head().getInt(0)
    (df.drop("num_buckets"), nb)
  }

  // ------------------------------------------------------- Merkle tree

  /** Hierarchical (Merkle) fingerprint levels over md5-PREFIX buckets:
    * level 0 = one digest per `hexLen`-hex-char bucket (the
    * [[graft.functions.Parity.sortedMd5]] streaming fold — O(1) digest
    * state per bucket), level k = one digest per (hexLen−k)-char
    * prefix, computed as md5 over the CONCATENATION of its children's
    * digests in node order (a true Merkle parent — child corruption
    * cannot cancel, unlike a sum), up to the single root digest at
    * level `hexLen` (node = empty prefix). Output:
    * (level, node, fingerprint, n).
    *
    * Why a tree instead of the flat store: a 100 TB re-audit against
    * a flat bucket table reads ALL buckets to find one drifted one;
    * against the tree, [[merkleLocalize]] reads the root (1 row), then
    * only the children of mismatched nodes per level — O(fanout ·
    * drifted-subtrees · levels) stored rows, log-narrow passes.
    *
    * The leaf pass is the only data-sized job; upper levels aggregate
    * the tiny digest table, each parent collecting ≤16 child digests
    * (`collect_list` bounded by the hex fanout). The leaf is referenced
    * by every level, so it is persisted behind the returned
    * [[graft.operators.DedupPlan]]'s release contract.
    */
  def merkleTreePlan(canon: DataFrame, hexLen: Int = 2): graft.operators.DedupPlan = {
    require(hexLen >= 1 && hexLen <= 4, "hexLen in 1..4 (16..65536 leaf buckets)")
    import org.apache.spark.storage.StorageLevel
    val leaf = graft.functions.Parity
      .sortedMd5(canon, substring(md5(col("canon")), 1, hexLen), col("canon"))
      .select(col("bucket").as("node"), col("fingerprint"), col("n"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame](
      leaf.withColumn("level", lit(0)))
    var cur = leaf
    // prefix lengths hexLen-1 down to 0 (root)
    for (plen <- (0 until hexLen).reverse) {
      cur = cur
        .groupBy(substring(col("node"), 1, plen).as("node"))
        .agg(
          // parent digest = md5 of child digests joined by \n in child-
          // node order — mirrored verbatim by the DuckDB oracle's
          // md5(string_agg(fingerprint, chr(10) ORDER BY node))
          md5(array_join(
            transform(
              array_sort(collect_list(struct(col("node").as("b"), col("fingerprint").as("f")))),
              x => x.getField("f")),
            "\n")).as("fingerprint"),
          sum(col("n")).as("n"))
      levels += cur.withColumn("level", lit(hexLen - plen))
    }
    val tree = levels.reduce(_.unionByName(_))
      .select(col("level"), col("node"), col("fingerprint"), col("n"))
    graft.operators.DedupPlan(tree, "merkle_tree", Seq(leaf))
  }

  /** Write the Merkle fingerprint store for `df` (canonicalized with
    * [[graft.canon.Canonicalizer.canonRow]]): one parquet table
    * partitioned by `level`, each row carrying its `parent` node id so
    * [[merkleLocalize]]'s per-level reads are plain pushdown-able
    * equality filters (level directory pruning + parent IN (...)).
    */
  def writeMerkle(df: DataFrame, path: String, hexLen: Int = 2): Unit = {
    val canon = df.select(graft.canon.Canonicalizer.canonRow(df).as("canon"))
    val plan = merkleTreePlan(canon, hexLen)
    // An EMPTY input yields an empty tree, which parquet writes as a
    // schemaless directory no reader can open — and "no store" is not
    // the same auditable fact as "a store of zero rows". The Merkle
    // definition extends naturally: the root over zero children is the
    // digest of the empty concatenation (md5("")), n = 0, so an empty
    // snapshot gets a real, comparable root and merkleLocalize works
    // unmodified (empty-vs-empty matches at the root; empty-vs-full
    // walks down to the full side's leaves).
    val spark = df.sparkSession
    import spark.implicits._
    val tree =
      if (plan.df.isEmpty)
        Seq((hexLen, "", EmptyMd5, 0L)).toDF("level", "node", "fingerprint", "n")
      else plan.df
    tree
      .withColumn("parent",
        when(col("node") === "", lit(null).cast("string"))
          .otherwise(expr("substring(node, 1, length(node) - 1)")))
      .withColumn("hex_len", lit(hexLen))
      .write.mode("overwrite").partitionBy("level").parquet(path)
    plan.release()
  }

  /** md5 of the empty byte string — the root digest of a zero-row
    * store (see [[writeMerkle]]).
    */
  val EmptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"

  /** Localization result: the drifted LEAF buckets plus the read cost
    * actually paid (`nodesRead` across both stores — the number a flat
    * compare would pay is 2 · 16^hexLen regardless of drift).
    * `exhaustive` is false only when a frontier exceeded `maxFrontier`
    * and the walk degraded to comparing the full next level (never a
    * silent cap — the result says so).
    */
  final case class MerkleDiff(driftedBuckets: Seq[String], nodesRead: Long,
      exhaustive: Boolean)

  /** Top-down Merkle walk over two stored trees: compare roots (one
    * row each); descend ONLY into mismatched nodes, reading each
    * level filtered by `parent IN frontier`. Returns the drifted leaf
    * buckets without ever reading the matched subtrees — the O(log)
    * re-audit. Frontiers are driver state bounded by
    * `maxFrontier` (drifted-subtree count; a wider drift degrades to
    * full-level reads, reported via `exhaustive`).
    */
  def merkleLocalize(spark: SparkSession, pathA: String, pathB: String,
      maxFrontier: Int = 4096): MerkleDiff = {
    val a0 = spark.read.parquet(pathA)
    val b0 = spark.read.parquet(pathB)
    val hexLen = a0.select(max(col("level"))).head().getInt(0)
    require(b0.select(max(col("level"))).head().getInt(0) == hexLen,
      "stores were built with different hexLen — not comparable")
    var nodesRead = 0L
    var exhaustive = true
    def mismatched(level: Int, frontier: Option[Seq[String]]): Seq[String] = {
      def side(df: DataFrame, tag: String) = {
        val lvl = df.where(col("level") === level)
        frontier.fold(lvl)(f => lvl.where(col("parent").isin(f: _*)))
          .select(col("node"), col("fingerprint").as(s"${tag}_fp"),
            col("n").as(s"${tag}_n"))
      }
      val rows = side(a0, "a").join(side(b0, "b"), Seq("node"), "full_outer")
      val bad = rows.where(
        !(col("a_fp") <=> col("b_fp")) || !(col("a_n") <=> col("b_n")))
        .select(col("node")).collect().map(_.getString(0)).toSeq
      nodesRead += 2L * rows.count()
      bad
    }
    var frontier = mismatched(hexLen, None) // root: one node each side
    var level = hexLen - 1
    while (level >= 0 && frontier.nonEmpty) {
      val f =
        if (frontier.size <= maxFrontier) Some(frontier)
        else { exhaustive = false; None } // degrade loudly, never silently
      frontier = mismatched(level, f)
      level -= 1
    }
    MerkleDiff(frontier.sorted, nodesRead, exhaustive)
  }

  /** (mismatchedBuckets, storedRowCount, liveRowCount). */
  def compareWithStored(df: DataFrame, path: String): (Long, Long, Long) = {
    val (stored, nb) = read(df.sparkSession, path)
    val live = Comparator.fingerprints(Comparator.withBuckets(df, nb))
    val j = stored
      .withColumnRenamed("cnt", "s_cnt").withColumnRenamed("hsum", "s_hsum")
      .withColumnRenamed("h2sum", "s_h2sum")
      .join(live.withColumnRenamed("cnt", "l_cnt").withColumnRenamed("hsum", "l_hsum")
        .withColumnRenamed("h2sum", "l_h2sum"), Seq("__bucket"), "full_outer")
    val r = j.agg(
      sum(when(
        !(coalesce(col("s_cnt"), lit(0L)) === coalesce(col("l_cnt"), lit(0L))) ||
        !(coalesce(col("s_hsum"), lit(0)) <=> coalesce(col("l_hsum"), lit(0))) ||
        !(coalesce(col("s_h2sum"), lit(0)) <=> coalesce(col("l_h2sum"), lit(0))), 1L)
        .otherwise(0L)).as("bad"),
      coalesce(sum("s_cnt"), lit(0L)),
      coalesce(sum("l_cnt"), lit(0L))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }
}
