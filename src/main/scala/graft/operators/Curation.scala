package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end curation pipeline — the composition the individual
  * operators exist FOR, run as ONE lazy Spark plan:
  *
  *   documents
  *     → MinHash-LSH candidate pairs       (Dedup.minhashCandidates)
  *     → connected components              (Dedup.connectedComponents)
  *     → quality-aware keeper election     (Dedup.keeperByQuality)
  *     → deterministic train/val/test split (Sampling.hashSplit)
  *     → per-split summary
  *
  * Each stage is oracle-gated on its own; this gate row proves the
  * COMPOSITION is — outputs feed inputs with no driver round-trips, no
  * materialization between stages, and the whole pipeline remains one
  * Catalyst plan (checkpoint boundaries inside connected components
  * excepted, by design).
  *
  * Scale: the pipeline inherits each stage's bounds — banded candidate
  * join, O(log d) clustering rounds, one argmax shuffle, shuffle-free
  * split — so its cost is the sum of its parts, not a new bottleneck.
  */
object Curation {

  /** Kept (deduplicated, best-copy) documents with split labels:
    * (doc_id, cluster_id, n_chars, split) — one row per KEEPER.
    */
  def curate(docs: DataFrame): DataFrame = {
    val clusters = Dedup.connectedComponents(docs, Dedup.minhashCandidates(docs))
    val scores = docs.select(col("doc_id"), length(col("text")).cast("long").as("score"))
    val keepers = Dedup.keeperByQuality(clusters, scores)
      .select(col("keeper").as("doc_id"), col("cluster_id"), col("keeper_score").as("n_chars"))
    Sampling.hashSplit(keepers, col("doc_id"), Sampling.GateWeights)
  }

  // ---------------------------------------------------------------- gate

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-split keeper counts + exact char volume — the dataset-card
    // summary a curation run ends with
    "pipe_curation" -> ((s, dir) =>
      curate(table(s, dir, "documents"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .orderBy("split")),
  )

  def oracles: Map[String, String] = Map(
    "pipe_curation" ->
      s"""WITH RECURSIVE ${Dedup.clustersCte},
         |clusters AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
         |scored AS (
         | SELECT c.cluster_id, c.doc_id, CAST(length(d.text) AS BIGINT) AS score
         | FROM clusters c JOIN documents d USING (doc_id)),
         |ranked AS (
         | SELECT cluster_id, doc_id, score,
         |  ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC) AS rn
         | FROM scored),
         |keepers AS (
         | SELECT doc_id, score AS n_chars FROM ranked WHERE rn = 1),
         |labeled AS (
         | SELECT doc_id, n_chars,
         |  ${Sampling.splitCaseSql("doc_id", Sampling.GateWeights)} AS split
         | FROM keepers)
         |SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
         |FROM labeled GROUP BY split ORDER BY split""".stripMargin,
  )
}
