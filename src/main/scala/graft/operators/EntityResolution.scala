package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — match records that refer to
  * the same real-world entity under noisy representations (the
  * structured-data sibling of the text near-dup family, and the other
  * classic "compare two datasets" workload next to the diff engine:
  * the reference compares snapshots of ONE table for equality; ER
  * links records ACROSS noisy sources).
  *
  * Two stages, the standard shape (Fellegi–Sunter style blocking +
  * pairwise verification):
  *
  *  1. BLOCKING — records meet only inside a cheap deterministic
  *     block key (here: a name token + a categorical attribute).
  *     This is what makes ER tractable: the self-join is keyed on the
  *     block, so cost is Σ_block n_b², never N². Oversized blocks
  *     (stop-token keys — every corpus has them) are dropped by
  *     `maxBlockSize` rather than allowed to go quadratic; standard
  *     practice, and the drop is observable via [[oversizedBlocks]].
  *  2. VERIFY — exact Levenshtein edit distance on the name, a
  *     codegen'd integer DP (`functions.levenshtein`) identical
  *     across engines — no float similarity, so the gate hash-matches
  *     bit-for-bit where a Jaro–Winkler score would diverge in ulps.
  *
  * At 100 TB the blocked self-join shuffles on the block key (both
  * sides co-partition), each block verifies independently, and the
  * block-size cap bounds the worst partition — the same skew story as
  * the dedup family's hot-shingle handling, enforced structurally.
  *
  * Clustering the verified pairs reuses [[Dedup.connectedComponents]]
  * (pointer doubling, O(log d) rounds) — one clustering engine across
  * text near-dups, embedding near-dups, and record linkage.
  */
object EntityResolution {

  /** Candidate pairs from equality blocking, verified by Levenshtein
    * distance on `name` ≤ `maxDist`. Output one row per verified pair:
    * (block, id_a, id_b, name_dist), id_a < id_b.
    */
  def blockedPairs(records: DataFrame, id: Column, name: Column, block: Column,
                   maxDist: Int = 3, maxBlockSize: Int = 10000): DataFrame = {
    val r = records.select(id.as("rec_id"), name.as("name"), block.as("block"))
    // One extra shuffle at the block grain to measure block sizes; the
    // cap keeps a degenerate key from going quadratic. At gate and
    // bench scale no block approaches the cap — it is purely the guard.
    val sizes = r.groupBy(col("block")).agg(count(lit(1)).as("__bs"))
    val bounded = r.join(sizes.where(col("__bs") <= maxBlockSize), Seq("block"))
      .drop("__bs")
    val a = bounded.select(col("block"), col("rec_id").as("id_a"), col("name").as("name_a"))
    val b = bounded.select(col("block"), col("rec_id").as("id_b"), col("name").as("name_b"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("name_dist"))
      .where(col("name_dist") <= maxDist)
  }

  /** Sorted-neighborhood candidate pairs — the classic complement to
    * equality blocking: records are globally ordered by `sortKey` in
    * its NATIVE type order (numeric keys sort numerically, strings
    * lexicographically; totalized with `id` as tiebreak) and every
    * pair within `window` positions becomes a candidate, so
    * near-misses that an exact blocking key separates (typos in the
    * key itself) still meet.
    * Output (id_a, id_b, rank_dist) with id_a the lower-ranked record
    * and 1 ≤ rank_dist < window.
    *
    * Scale shape — the textbook hazard is the global `row_number`
    * (an unpartitioned window funnels every row through ONE reducer).
    * Here the global rank is computed in bounded steps: range-exchange
    * on the sort key, rank WITHIN each range (per-range windows), and
    * add per-range exclusive-prefix offsets (one tiny count per range
    * — `numRanges` longs to the driver, back as a map literal; ranges
    * are ordered by construction, so offset(pid) totalizes the rank).
    * Pairing is a self-join on the rank bucket floor(rank/window),
    * the probe side replicated into its own and its PREVIOUS bucket —
    * every pair within `window` ranks meets in exactly one keyed
    * bucket join, never a cartesian, and bucket population is exactly
    * `window` rows. The output is a pure function of the total order,
    * so the (sampled, partitioning-dependent) range bounds cannot
    * move a result bit.
    */
  def sortedNeighborhoodPairs(records: DataFrame, id: Column, sortKey: Column,
      window: Int = 5, numRanges: Int = 64): DataFrame =
    sortedNeighborhoodPairsPlan(records, id, sortKey, window, numRanges).df

  /** Managed form of [[sortedNeighborhoodPairs]]: the ranked frame is
    * localCheckpoint()ed (counts + ranking reuse ONE materialization
    * and the partition ids stay stable for both consumers), and the
    * returned plan's `release()` drops those checkpoint blocks once
    * the caller has consumed the pairs — a long-running session
    * running many SN passes must not accumulate them.
    */
  def sortedNeighborhoodPairsPlan(records: DataFrame, id: Column, sortKey: Column,
      window: Int = 5, numRanges: Int = 64): graft.operators.DedupPlan = {
    import org.apache.spark.sql.graftshim.CheckpointBridge
    require(window >= 2, s"sortedNeighborhoodPairs: window must be >= 2, got $window")
    require(numRanges >= 1, "need numRanges >= 1")
    // the sort key keeps its NATIVE type end-to-end: the range
    // exchange, the per-range window and the oracle's total order all
    // agree on the column's own ordering (a string cast here would
    // silently turn numeric keys lexicographic: '10' < '2')
    val r = records.select(id.as("rec_id"), sortKey.as("sk"))
    val parted = r.repartitionByRange(numRanges, col("sk"), col("rec_id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val releaseParted = () => CheckpointBridge.release(parted)
    val offsets: Map[Int, Long] = {
      val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
        .collect().map(x => x.getInt(0) -> x.getLong(1)).sortBy(_._1)
      var acc = 0L
      counts.map { case (p, n) => val o = p -> acc; acc += n; o }.toMap
    }
    if (offsets.isEmpty) { // empty input: keep the output schema, zero rows
      return graft.operators.DedupPlan(
        r.limit(0).select(col("rec_id").as("id_a"),
          col("rec_id").as("id_b"), lit(0L).as("rank_dist")),
        "sorted_neighborhood", Nil, finalizers = Seq(releaseParted))
    }
    val w = Window.partitionBy(col("__pid")).orderBy(col("sk"), col("rec_id"))
    val ranked = parted
      .withColumn("__rank",
        row_number().over(w).cast("long") - 1L +
          element_at(typedLit(offsets), col("__pid")))
    val a = ranked.select(col("rec_id").as("id_a"), col("__rank").as("rank_a"),
      floor(col("__rank") / window).as("b"))
    val bSide = ranked.select(col("rec_id").as("id_b"), col("__rank").as("rank_b"),
      floor(col("__rank") / window).as("b0"))
      .select(col("id_b"), col("rank_b"),
        explode(array(col("b0"), col("b0") - 1)).as("b"))
    val pairs = a.join(bSide, Seq("b"))
      .where(col("rank_b") > col("rank_a") &&
        col("rank_b") - col("rank_a") < window)
      .select(col("id_a"), col("id_b"),
        (col("rank_b") - col("rank_a")).as("rank_dist"))
    graft.operators.DedupPlan(pairs, "sorted_neighborhood", Nil,
      finalizers = Seq(releaseParted))
  }

  /** Multi-pass sorted neighborhood — the production SN form: one
    * pass per independent sort key (name, name-reversed, phonetic,
    * zip+street…) and the candidate sets unioned, because a single
    * key can never bring together records that diverge in its own
    * prefix (a leading-token typo pushes the record arbitrarily far
    * in that order, but a REVERSED-name pass still lands it next to
    * its match). Pairs are normalized to id_a < id_b before the
    * union; output one row per distinct pair with `n_keys` = how many
    * passes surfaced it (agreement across independent orders is
    * itself match evidence) and `min_rank_dist` = the closest rank
    * distance any pass observed.
    *
    * Scale shape: k independent SN passes (each the bounded
    * range-exchange + per-range rank + keyed bucket join of
    * [[sortedNeighborhoodPairs]] — no global window funnel), then one
    * map-side-combinable aggregate at the pair grain. Cost is k× one
    * pass; k is 2–3 in practice.
    */
  def sortedNeighborhoodMulti(records: DataFrame, id: Column,
      sortKeys: Seq[Column], window: Int = 5, numRanges: Int = 64): DataFrame =
    sortedNeighborhoodMultiPlan(records, id, sortKeys, window, numRanges).df

  /** Managed form of [[sortedNeighborhoodMulti]]: forwards every
    * pass's checkpoint-release finalizer, so one `release()` frees the
    * ranked frames of all k passes.
    */
  def sortedNeighborhoodMultiPlan(records: DataFrame, id: Column,
      sortKeys: Seq[Column], window: Int = 5, numRanges: Int = 64): graft.operators.DedupPlan = {
    require(sortKeys.nonEmpty, "sortedNeighborhoodMulti: need at least one sort key")
    val plans = sortKeys.map(sk =>
      sortedNeighborhoodPairsPlan(records, id, sk, window, numRanges))
    val unioned = plans.map(_.df.select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("rank_dist")))
      .reduce(_ unionAll _)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_keys"), min(col("rank_dist")).as("min_rank_dist"))
    graft.operators.DedupPlan(unioned, "sorted_neighborhood_multi", Nil,
      finalizers = plans.map(pl => () => pl.release()))
  }

  /** The blocks [[blockedPairs]] would drop at `maxBlockSize` — the
    * auditable side channel for the cap (a silent drop would read as
    * "no matches" for exactly the entities with the noisiest keys).
    */
  def oversizedBlocks(records: DataFrame, block: Column, maxBlockSize: Int): DataFrame =
    records.groupBy(block.as("block")).agg(count(lit(1)).as("n_records"))
      .where(col("n_records") > maxBlockSize)

  /** Blocking-cost audit — the report that SIZES an ER run before it
    * executes: the block-size histogram with the EXACT pair cost each
    * size contributes (Σ over blocks of n·(n−1)/2 — precisely the
    * verify-join cost [[blockedPairs]] will pay), so `maxBlockSize`
    * and the blocking scheme itself are chosen from data, not hope. A
    * scheme whose largest sizes carry most of `n_pairs` is
    * quadratic-dominated and needs a finer key; a long size-1 tail is
    * recall lost to over-blocking.
    *
    * Scale shape: one map-side-combinable count at the BLOCK grain,
    * one at the size grain — the record table is scanned once and
    * nothing is ever joined.
    */
  def blockingProfile(records: DataFrame, block: Column): DataFrame =
    records.groupBy(block.as("block")).agg(count(lit(1)).as("n"))
      .groupBy(col("n").as("block_size"))
      .agg(count(lit(1)).as("n_blocks"))
      .select(col("block_size"), col("n_blocks"),
        (col("block_size") * col("n_blocks")).as("n_records"),
        (expr("block_size * (block_size - 1) DIV 2") * col("n_blocks"))
          .as("n_pairs"))
      .orderBy("block_size")

  /** Weighted multi-evidence match scoring — the Fellegi–Sunter
    * agreement step [[blockedPairs]]' single edit-distance gate only
    * approximates: each verified pair rejoins its two records and
    * accumulates INTEGER evidence weights (null-safe equality per
    * exact attribute, plus (maxDist − name_dist) · per-edit weight for
    * the fuzzy name), so downstream clustering can threshold on
    * total evidence instead of one field. Integer weights keep the
    * score hash-identical cross-engine where probabilistic m/u logits
    * would diverge in ulps.
    *
    * Scale shape: two id-keyed joins at the O(pairs) grain (pairs are
    * already block-bounded) — the records table shuffles on its key
    * once per side, never pairwise.
    */
  def matchScores(records: DataFrame, id: Column, pairs: DataFrame,
      exactAttrs: Seq[(String, Long)],
      nameWeightPerEdit: Long = 10L, maxDist: Long = 3L): DataFrame = {
    require(exactAttrs.nonEmpty, "need at least one exact attribute")
    val a = records.select(id.as("id_a") +:
      exactAttrs.map { case (c, _) => col(c).as(s"a_$c") }: _*)
    val b = records.select(id.as("id_b") +:
      exactAttrs.map { case (c, _) => col(c).as(s"b_$c") }: _*)
    val agree = exactAttrs.map { case (c, w) =>
      when(col(s"a_$c") <=> col(s"b_$c"), lit(w)).otherwise(lit(0L))
    }.reduce(_ + _)
    pairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("name_dist"),
        ((lit(maxDist) - col("name_dist")) * nameWeightPerEdit + agree).as("score"))
  }

  /** Threshold CALIBRATION sweep over scored pairs — the report that
    * turns [[matchScores]]' raw evidence into a defensible link
    * threshold: for each candidate threshold, how many pairs survive
    * and how many distinct records they touch. Read before committing
    * a threshold to [[clusters]]: the pair-count curve's elbow is
    * where coincidental evidence stops, and a records curve that
    * keeps climbing while pairs flatten means surviving links are
    * spreading (chains), not densifying (real entities) — the same
    * role [[graft.operators.Dedup]]'s calibration gate plays for
    * content dedup, at the entity grain.
    *
    * Scale shape: thresholds are a config constant list, so the
    * exploded pair stream is ≤ |thresholds| × pairs — linear. BOTH
    * counts come off ONE traversal of the scored input (matchScores'
    * two joins + the explode run once, not once per aggregate): each
    * surviving pair emits its two id legs with a pair-weight of 1 on
    * the id_a leg only, so per (threshold, id) group the weight sum
    * reconstructs the pair count while the group count itself is the
    * distinct-record count — both map-side-combinable. Thresholds
    * with no surviving pairs still report (0, 0) rows via the
    * threshold-list frame.
    */
  def thresholdSweep(scored: DataFrame, thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val thLit = typedlit(thresholds)
    val passed = scored.select(col("id_a"), col("id_b"),
      explode(filter(thLit, t => t <= col("score"))).as("threshold"))
    // both legs from ONE explode (a self-union would plant the scored
    // subtree twice in the plan — the exact double-execution this
    // shape exists to avoid)
    val legs = passed.select(col("threshold"), explode(array(
        struct(col("id_a").as("id"), lit(1L).as("pair_w")),
        struct(col("id_b").as("id"), lit(0L).as("pair_w")))).as("leg"))
      .select(col("threshold"), col("leg.id").as("id"),
        col("leg.pair_w").as("pair_w"))
    val counts = legs
      .groupBy(col("threshold"), col("id")).agg(sum(col("pair_w")).as("w"))
      .groupBy(col("threshold"))
      .agg(sum(col("w")).as("n_pairs"), count(lit(1)).as("n_records"))
    scored.sparkSession.range(1)
      .select(explode(thLit).as("threshold"))
      .join(counts, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_records"), lit(0L)).as("n_records"))
  }

  /** Verified pairs → entity clusters (connected components +
    * min-id canonical record election).
    */
  def clusters(records: DataFrame, id: Column, pairs: DataFrame): DataFrame =
    Dedup.connectedComponents(
      records.select(id.as("doc_id")),
      pairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
      .select(col("doc_id").as("rec_id"), col("cluster_id"), col("is_keeper"))

  /** Survivorship — the merge step that makes resolution USEFUL: one
    * golden record per cluster, each attribute set to the cluster's
    * MODE value (ties broken by value ascending; nulls never win).
    * This is the "most common non-null" survivorship rule; recency- or
    * source-priority rules are the same plan with a different window
    * order.
    *
    * Scale shape: one count + one per-cluster top-1 (WindowGroupLimit)
    * PER ATTRIBUTE, all at the (cluster, value) grain — never wider
    * than the input, usually far smaller; winners join back at the
    * O(clusters) grain. Attributes are independent single-pass
    * aggregations over ONE SHARED base join — which is therefore
    * referenced attrs.size + 1 times and must be persisted (the
    * engine's managed-plan rule: with a CC-derived cluster table
    * upstream, an unpersisted base re-executes the records⋈clusters
    * join once per attribute).
    *
    * Convenience form; callers needing cache hygiene in a long-lived
    * session should use [[goldenRecordsPlan]] and call `release()`
    * after consuming the result (the [[DedupPlan]] ownership
    * contract).
    */
  def goldenRecords(records: DataFrame, id: Column,
      clusters: DataFrame, attrs: Seq[String]): DataFrame =
    goldenRecordsPlan(records, id, clusters, attrs).df

  /** Managed form of [[goldenRecords]]: the shared base join is cached
    * MEMORY_AND_DISK_SER and owned by the returned plan's `release()`.
    */
  def goldenRecordsPlan(records: DataFrame, id: Column,
      clusters: DataFrame, attrs: Seq[String]): DedupPlan = {
    require(attrs.nonEmpty, "need at least one attribute")
    import org.apache.spark.storage.StorageLevel
    val base = records.select((id.as("rec_id") +: attrs.map(col)): _*)
      .join(clusters.select(col("rec_id"), col("cluster_id")), "rec_id")
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val sizes = base.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_records"))
    val out = attrs.foldLeft(sizes) { (acc, a) =>
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("__cnt").desc, col(a).asc)
      val winner = base.where(col(a).isNotNull)
        .groupBy(col("cluster_id"), col(a))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("cluster_id"), col(a))
      acc.join(winner, Seq("cluster_id"), "left")
    }
    DedupPlan(out, "golden_records", Seq(base))
  }

  // Gate wiring: parts whose two-word names share a last token (the
  // product noun) and a brand are candidates; names within edit
  // distance 3 link (adjective variants of one product line).
  private def partPairs(s: SparkSession, dir: String): DataFrame = {
    val p = table(s, dir, "part")
    blockedPairs(p, col("p_partkey"),
      col("p_name"),
      concat_ws("|", element_at(split(col("p_name"), " "), 2), col("p_brand")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_pairs" -> ((s, dir) => partPairs(s, dir).orderBy("id_a", "id_b")),
    // sorted-neighborhood candidates over the name order, window 4 —
    // catches near-misses whose blocking key itself is noisy
    "er_sorted_neighborhood" -> ((s, dir) =>
      sortedNeighborhoodPairs(table(s, dir, "part"),
        col("p_partkey"), col("p_name"), window = 4)
        .orderBy("id_a", "id_b")),
    // multi-pass SN: name order + REVERSED-name order unioned — the
    // pass pair that catches both leading- and trailing-token typos
    "er_sorted_multi" -> ((s, dir) =>
      sortedNeighborhoodMulti(table(s, dir, "part"), col("p_partkey"),
        Seq(col("p_name"), reverse(col("p_name"))), window = 4)
        .orderBy("id_a", "id_b")),
    // the pre-run cost report over the same blocking key er_pairs uses
    "er_blocks" -> ((s, dir) => {
      val p = table(s, dir, "part")
      blockingProfile(p,
        concat(element_at(split(col("p_name"), " "), 2), lit("|"), col("p_brand")))
    }),
    // evidence-weighted pair scores: brand agreement 30, type 20,
    // plus 10 per unspent name edit
    "er_scored" -> ((s, dir) =>
      matchScores(table(s, dir, "part"), col("p_partkey"), partPairs(s, dir),
        Seq("p_brand" -> 30L, "p_type" -> 20L))
        .orderBy("id_a", "id_b")),
    "er_clusters" -> ((s, dir) =>
      clusters(table(s, dir, "part"), col("p_partkey"), partPairs(s, dir))
        .orderBy("rec_id")),
    // the calibration curve over the scored pairs: surviving pairs
    // and touched records at every candidate threshold 0..80
    "er_threshold_sweep" -> ((s, dir) =>
      thresholdSweep(
        matchScores(table(s, dir, "part"), col("p_partkey"), partPairs(s, dir),
          Seq("p_brand" -> 30L, "p_type" -> 20L)),
        (0L to 80L by 10L).toSeq)
        .orderBy("threshold")),
    "er_golden" -> ((s, dir) => {
      val p = table(s, dir, "part")
      goldenRecords(p, col("p_partkey"),
        clusters(p, col("p_partkey"), partPairs(s, dir)),
        Seq("p_brand", "p_type"))
        .orderBy("cluster_id")
    }))

  private val pairsCte =
    """r AS (SELECT p_partkey AS rec_id, p_name AS name,
      |        split_part(p_name, ' ', 2) || '|' || p_brand AS block FROM part),
      |p AS (SELECT a.block, a.rec_id AS id_a, b.rec_id AS id_b,
      |        CAST(levenshtein(a.name, b.name) AS BIGINT) AS name_dist
      |      FROM r a JOIN r b ON a.block = b.block AND a.rec_id < b.rec_id),
      |vp AS (SELECT * FROM p WHERE name_dist <= 3)""".stripMargin

  def oracles: Map[String, String] = Map(
    // the oracle can afford the single-node global row_number the
    // Spark form exists to avoid; same (sk, id) total order
    "er_sorted_neighborhood" ->
      """WITH r AS (SELECT p_partkey AS rec_id, p_name AS sk FROM part),
        |rk AS (SELECT rec_id, sk,
        |  ROW_NUMBER() OVER (ORDER BY sk, rec_id) - 1 AS rnk FROM r)
        |SELECT a.rec_id AS id_a, b.rec_id AS id_b,
        | CAST(b.rnk - a.rnk AS BIGINT) AS rank_dist
        |FROM rk a JOIN rk b ON b.rnk > a.rnk AND b.rnk - a.rnk < 4
        |ORDER BY id_a, id_b""".stripMargin,
    // per-key SN rule replayed twice (name, reversed name), pairs
    // normalized to id_a < id_b, unioned, then the pair-grain rollup
    "er_sorted_multi" ->
      """WITH r AS (SELECT p_partkey AS rec_id, p_name AS sk1,
        |             reverse(p_name) AS sk2 FROM part),
        |rk1 AS (SELECT rec_id, ROW_NUMBER() OVER (ORDER BY sk1, rec_id) - 1 AS rnk FROM r),
        |rk2 AS (SELECT rec_id, ROW_NUMBER() OVER (ORDER BY sk2, rec_id) - 1 AS rnk FROM r),
        |p1 AS (SELECT LEAST(a.rec_id, b.rec_id) AS id_a,
        |         GREATEST(a.rec_id, b.rec_id) AS id_b,
        |         CAST(b.rnk - a.rnk AS BIGINT) AS rank_dist
        |       FROM rk1 a JOIN rk1 b ON b.rnk > a.rnk AND b.rnk - a.rnk < 4),
        |p2 AS (SELECT LEAST(a.rec_id, b.rec_id) AS id_a,
        |         GREATEST(a.rec_id, b.rec_id) AS id_b,
        |         CAST(b.rnk - a.rnk AS BIGINT) AS rank_dist
        |       FROM rk2 a JOIN rk2 b ON b.rnk > a.rnk AND b.rnk - a.rnk < 4),
        |u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
        |SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  MIN(rank_dist) AS min_rank_dist
        |FROM u GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,
    "er_blocks" ->
      """WITH r AS (SELECT split_part(p_name, ' ', 2) || '|' || p_brand AS block
        |  FROM part),
        |b AS (SELECT block, COUNT(*) AS n FROM r GROUP BY 1)
        |SELECT n AS block_size, COUNT(*) AS n_blocks,
        | n * COUNT(*) AS n_records,
        | (n * (n - 1) // 2) * COUNT(*) AS n_pairs
        |FROM b GROUP BY n ORDER BY block_size""".stripMargin,
    "er_pairs" ->
      s"""WITH $pairsCte
         |SELECT block, id_a, id_b, name_dist FROM vp ORDER BY id_a, id_b""".stripMargin,
    "er_scored" ->
      s"""WITH $pairsCte
         |SELECT vp.id_a, vp.id_b, vp.name_dist,
         | (3 - vp.name_dist) * 10
         |  + (CASE WHEN a.p_brand IS NOT DISTINCT FROM b.p_brand THEN 30 ELSE 0 END)
         |  + (CASE WHEN a.p_type IS NOT DISTINCT FROM b.p_type THEN 20 ELSE 0 END)
         |   AS score
         |FROM vp
         | JOIN part a ON a.p_partkey = vp.id_a
         | JOIN part b ON b.p_partkey = vp.id_b
         |ORDER BY vp.id_a, vp.id_b""".stripMargin,
    // the scored CTE swept over the 0..80 threshold grid: per
    // threshold, surviving pair count + distinct touched records
    "er_threshold_sweep" ->
      s"""WITH $pairsCte,
         |sc AS (SELECT vp.id_a, vp.id_b,
         |  (3 - vp.name_dist) * 10
         |   + (CASE WHEN a.p_brand IS NOT DISTINCT FROM b.p_brand THEN 30 ELSE 0 END)
         |   + (CASE WHEN a.p_type IS NOT DISTINCT FROM b.p_type THEN 20 ELSE 0 END)
         |    AS score
         | FROM vp
         |  JOIN part a ON a.p_partkey = vp.id_a
         |  JOIN part b ON b.p_partkey = vp.id_b),
         |th AS (SELECT CAST(t AS BIGINT) AS threshold
         |       FROM range(0, 81, 10) r(t)),
         |pc AS (SELECT threshold, COUNT(*) AS n_pairs
         | FROM th JOIN sc ON sc.score >= th.threshold GROUP BY 1),
         |rc AS (SELECT threshold, COUNT(*) AS n_records FROM (
         |  SELECT DISTINCT threshold, id FROM (
         |   SELECT th.threshold, sc.id_a AS id FROM th
         |    JOIN sc ON sc.score >= th.threshold
         |   UNION ALL
         |   SELECT th.threshold, sc.id_b FROM th
         |    JOIN sc ON sc.score >= th.threshold)) GROUP BY 1)
         |SELECT th.threshold,
         | CAST(COALESCE(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
         | CAST(COALESCE(rc.n_records, 0) AS BIGINT) AS n_records
         |FROM th LEFT JOIN pc USING (threshold) LEFT JOIN rc USING (threshold)
         |ORDER BY th.threshold""".stripMargin,
    "er_clusters" ->
      s"""WITH RECURSIVE $pairsCte,
         |edges AS (SELECT id_a AS u, id_b AS v FROM vp
         |          UNION ALL SELECT id_b, id_a FROM vp),
         |reach(u, v) AS (
         | SELECT p_partkey, p_partkey FROM part
         | UNION
         | SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         |SELECT u AS rec_id, MIN(v) AS cluster_id, (u = MIN(v)) AS is_keeper
         |FROM reach GROUP BY u ORDER BY rec_id""".stripMargin,
    "er_golden" ->
      s"""WITH RECURSIVE $pairsCte,
         |edges AS (SELECT id_a AS u, id_b AS v FROM vp
         |          UNION ALL SELECT id_b, id_a FROM vp),
         |reach(u, v) AS (
         | SELECT p_partkey, p_partkey FROM part
         | UNION
         | SELECT r2.u, e.v FROM reach r2 JOIN edges e ON r2.v = e.u),
         |cl AS (SELECT u AS rec_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
         |base AS (SELECT cl.cluster_id, part.p_brand, part.p_type
         |  FROM part JOIN cl ON p_partkey = rec_id),
         |sizes AS (SELECT cluster_id, COUNT(*) AS n_records FROM base GROUP BY cluster_id),
         |w1 AS (SELECT cluster_id, p_brand FROM (
         |  SELECT cluster_id, p_brand,
         |   ROW_NUMBER() OVER (PARTITION BY cluster_id
         |     ORDER BY COUNT(*) DESC, p_brand) AS rn
         |  FROM base WHERE p_brand IS NOT NULL GROUP BY cluster_id, p_brand)
         | WHERE rn = 1),
         |w2 AS (SELECT cluster_id, p_type FROM (
         |  SELECT cluster_id, p_type,
         |   ROW_NUMBER() OVER (PARTITION BY cluster_id
         |     ORDER BY COUNT(*) DESC, p_type) AS rn
         |  FROM base WHERE p_type IS NOT NULL GROUP BY cluster_id, p_type)
         | WHERE rn = 1)
         |SELECT s.cluster_id, s.n_records, w1.p_brand, w2.p_type
         |FROM sizes s
         | LEFT JOIN w1 USING (cluster_id)
         | LEFT JOIN w2 USING (cluster_id)
         |ORDER BY cluster_id""".stripMargin)
}
