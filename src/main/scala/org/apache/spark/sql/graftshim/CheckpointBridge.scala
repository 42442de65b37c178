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

  /** Clamp a checkpoint leaf's inherited size estimate to the Long
    * range. Since Spark 3.4, `Dataset.checkpoint` PRESERVES the origin
    * plan's `Statistics` on the returned `LogicalRDD` — so checkpointing
    * does NOT reset size-only estimates, and in an ITERATIVE algorithm
    * the estimates COMPOUND: the size-only visitor estimates a join as
    * the PRODUCT of its children, round N's leaf inherits round N-1's
    * product, and with j joins per round the digit count grows by a
    * factor of ~j per round — BigInts of hundreds of thousands of
    * digits within ~8 rounds. Every subsequent stats walk (the
    * runtime-filter rule's broadcastability probe, join selection) then
    * burns driver MINUTES in BigInteger Toom-Cook multiplication while
    * all executors idle. Measured: the sf10 embedding-dedup composition
    * (auto LSH pairs → connected components) went from a >9-minute
    * driver-bound stall to executor-bound wall once rounds were
    * clamped; jstack showed `SizeInBytesOnlyStatsPlanVisitor` inside
    * `InjectRuntimeFilter` at Toom-Cook recursion depth 4+.
    *
    * The clamp is semantics-preserving in the only sense that matters:
    * `sizeInBytes` means BYTES, and a value beyond Long.MaxValue (8
    * exbibytes) carries no information a planner could act on — every
    * size-gated decision (broadcast thresholds ~100 MB) saturated long
    * before. GENUINE small estimates (a checkpointed 100 MB dimension)
    * pass through untouched, so downstream auto-broadcast decisions
    * keep working. No-op for non-checkpoint plans.
    */
  def capStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val s = l.computeStats()
        // rowCount compounds the same way under CBO (row-count join
        // products), so it gets the same Long-range clamp
        if (s.sizeInBytes.isValidLong && s.rowCount.forall(_.isValidLong)) df
        else {
          val capped = org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = s.sizeInBytes.min(BigInt(Long.MaxValue)),
            rowCount = s.rowCount.map(_.min(BigInt(Long.MaxValue))))
          val session = df.sparkSession
            .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          val fresh = new LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(
            session, Some(capped), Some(l.constraints))
          org.apache.spark.sql.classic.Dataset.ofRows(session, fresh)
        }
      case _ => df
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
