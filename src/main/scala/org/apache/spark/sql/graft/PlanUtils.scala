package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Logical-plan utilities needing the `private[sql]` surface (same
  * placement rationale as [[ExprBridge]]).
  */
object PlanUtils {

  /** Wrap `df` as a LogicalRDD leaf — the lineage-truncation step of the
    * iterative CC algorithms (graft.ops.TextOps) — PRESERVING the
    * physical output partitioning and ordering, exactly as
    * `Dataset.checkpoint` does internally (`LogicalRDD.fromDataset`).
    *
    * Two wins over the public-API form
    * (`createDataFrame(df.rdd, df.schema)`) it replaces:
    *  - partitioning survives, so a round's `groupBy`/`join` on the same
    *    key reuses the previous round's shuffle instead of re-exchanging
    *    every iteration (the public form loses outputPartitioning — every
    *    round re-shuffled data that was already correctly placed);
    *  - `queryExecution.toRdd` stays in InternalRow, where `df.rdd`
    *    deserializes to Row and `createDataFrame` re-encodes — a per-row,
    *    per-round conversion tax on the hot loop.
    *
    * Unlike `localCheckpoint` the RDD lineage stays intact: blocks remain
    * recomputable on executor loss and per-round caches stay
    * unpersistable (the properties the CC loops rely on).
    *
    * Call AFTER the df's cache is materialized when AQE is on: the
    * partitioning is read from the executed plan, which a not-yet-final
    * adaptive plan has not pinned down.
    */
  def truncatePreservingPartitioning(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    Dataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false))
  }
}
