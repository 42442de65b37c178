package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the materialized RDD behind a checkpointed Dataset.
  *
  * `Dataset.localCheckpoint()` persists its internal RDD and returns a
  * Dataset over a `LogicalRDD` leaf, but exposes no handle to release
  * those blocks once a newer checkpoint supersedes them — in iterative
  * algorithms (connected components) the superseded rounds otherwise
  * accumulate O(rounds × |V|) in executor block storage until the
  * driver GCs the references. This shim pattern-matches the leaf and
  * hands the RDD back so the loop can `unpersist` retired rounds
  * deterministically.
  */
object CheckpointBridge {
  /** The checkpointed RDD backing `df`, when `df` is exactly a
    * (local)checkpoint result; None for any other plan shape.
    */
  def checkpointedRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _             => None
    }

  /** Release the blocks of a superseded checkpointed Dataset (no-op
    * for non-checkpoint plans and for reliable checkpoints, whose
    * files are managed by the context cleaner).
    */
  def release(df: DataFrame): Unit =
    checkpointedRdd(df).foreach(_.unpersist(blocking = false))
}
