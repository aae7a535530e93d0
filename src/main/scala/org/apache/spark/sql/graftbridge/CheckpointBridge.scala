package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Unpersist the block-manager state behind a `localCheckpoint`ed
  * Dataset.
  *
  * `Dataset.unpersist` only drops the SQL columnar cache; the raw-row
  * blocks a local checkpoint persists live on the internal RDD wrapped
  * by the resulting `LogicalRDD` plan, which Spark does not expose —
  * they are freed only when the RDD is garbage-collected. Iterative
  * algorithms (the connected-components loop) that checkpoint per round
  * would otherwise accumulate every round's blocks for the whole run;
  * this shim lets the loop free round r-1's state as soon as round r is
  * materialized, making the live footprint O(1) rounds instead of O(R).
  *
  * Safety contract: after unpersist the checkpoint CANNOT be recomputed
  * (local checkpointing truncates lineage by design) — callers must only
  * free frames that no future action will read.
  */
object CheckpointBridge {
  def unpersistLocalCheckpoint(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
