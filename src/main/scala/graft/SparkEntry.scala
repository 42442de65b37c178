package graft

import graft.diff.{Comparator, CompareOptions}
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-domain modules:
  *   - [[graft.queries.Relational]]      — the relational layer (Catalyst)
  *   - [[graft.queries.CompareQueries]]  — the diff engine's own operators
  *   - [[graft.operators.Dedup]]         — exact/MinHash/SimHash/Jaccard dedup
  *   - [[graft.operators.TextAnalysis]]  — lang-id / quality / tokens / fingerprint
  *   - [[graft.operators.Similarity]]    — embedding ANN search
  */
object SparkEntry {

  /** Flagship: the full comparator on sf0.001 — lineitem vs a 1-row
    * mutated copy; returns the orphan rows (2: one per side).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = GraftSession.table(spark, dir, "lineitem")
    Comparator.compare(li, CompareQueries.mutated(li), CompareOptions(numBuckets = 256)).orphans
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ CompareQueries.queries ++
      operators.Dedup.queries ++ operators.TextAnalysis.queries ++
      operators.Similarity.queries ++ operators.Multimodal.queries ++
      operators.Profiler.queries ++ operators.Sampling.queries ++
      operators.Curation.queries ++ operators.EntityResolution.queries ++
      operators.Graph.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ CompareQueries.oracles ++
      operators.Dedup.oracles ++ operators.TextAnalysis.oracles ++
      operators.Similarity.oracles ++ operators.Multimodal.oracles ++
      operators.Profiler.oracles ++ operators.Sampling.oracles ++
      operators.Curation.oracles ++ operators.EntityResolution.oracles ++
      operators.Graph.oracles
}
