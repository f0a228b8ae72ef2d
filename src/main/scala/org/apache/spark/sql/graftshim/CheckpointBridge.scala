package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to release the RDD-level persistence behind
  * `Dataset.localCheckpoint()`. A checkpointed Dataset is a `LogicalRDD`
  * over a PERSISTED RDD; `Dataset.unpersist()` only clears CacheManager
  * plan entries, so without this the checkpoint RDD stays pinned in
  * `SparkContext.getPersistentRDDs` for the session's lifetime — a storage
  * leak for iterative trainers that checkpoint per round. Lives under
  * `org.apache.spark.sql` purely for access to the `private[sql]`
  * `LogicalRDD`; contains no Spark-internal logic of its own.
  */
object CheckpointBridge {

  /** Unpersist the checkpoint RDD(s) in `df`'s plan (no-op for plans
    * without one).
    */
  def unpersistCheckpoint(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.logical.foreach {
      case l: LogicalRDD if l.rdd.getStorageLevel.useMemory ||
          l.rdd.getStorageLevel.useDisk =>
        l.rdd.unpersist(blocking)
      case _ =>
    }
}
