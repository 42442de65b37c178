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
/** Type comparison modulo nullability metadata. containsNull/nullable
  * flags describe what a side COULD hold, not what it does — a parquet
  * scan (flags true) and a constructed frame (flags false) with equal
  * values must pass the schema gate. Spark's own
  * `DataType.equalsIgnoreNullability` is not public API; this shim
  * package (inside org.apache.spark.sql) can reach it.
  */
object TypeBridge {
  def sameTypeIgnoreNullability(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.types.DataType.equalsIgnoreNullability(a, b)
}

object CheckpointBridge {
  /** The checkpointed RDD backing `df`, when `df` is exactly a
    * (local)checkpoint result; None for any other plan shape.
    */
  def checkpointedRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _             => None
    }

  /** Release a superseded checkpointed Dataset: unpersist its blocks
    * and, for RELIABLE checkpoints, delete its checkpoint files (the
    * context cleaner only does that on GC, and only when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is set —
    * deterministic deletion keeps the checkpoint dir at O(|V|), not
    * O(rounds × |V|)). Only call once every consumer of `df` has been
    * materialized into its own checkpoint. No-op for non-checkpoint
    * plans.
    */
  def release(df: DataFrame): Unit =
    checkpointedRdd(df).foreach { rdd =>
      rdd.unpersist(blocking = false)
      rdd.getCheckpointFile.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(rdd.context.hadoopConfiguration)
        fs.delete(path, true)
      }
    }
}
