package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeMap, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection, UnknownPartitioning}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Logical-plan utilities needing the `private[sql]` surface (same
  * placement rationale as [[ExprBridge]]).
  */
object PlanUtils {

  /** Wrap `df` as a LogicalRDD leaf — the lineage-truncation step of the
    * iterative CC algorithms (graft.ops.TextOps) — PRESERVING the
    * physical output partitioning and ordering (the mechanism of
    * `Dataset.checkpoint`, `LogicalRDD.fromDataset`).
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
    * AQE wrinkle (measured): with adaptive execution on — the default —
    * the executed plan is an `AdaptiveSparkPlanExec` whose
    * `outputPartitioning` reports Unknown, so `fromDataset` alone
    * captures nothing and every downstream round re-exchanges. The fix
    * unwraps the adaptive plan (`executedPlan` — the CURRENT physical
    * plan, final after materialization) and maps its real partitioning/
    * ordering onto the LogicalRDD's output attributes. Call AFTER the
    * df's cache is materialized so the adaptive plan (and any AQE
    * coalescing, whose `CoalescedHashPartitioning` still satisfies the
    * clustered distributions the CC rounds need) is settled.
    *
    * Unlike `localCheckpoint` the RDD lineage stays intact: blocks remain
    * recomputable on executor loss and per-round caches stay
    * unpersistable (the properties the CC loops rely on).
    */
  def truncatePreservingPartitioning(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val qe = ds.queryExecution
    val rdd = qe.toRdd
    val base = LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    val out =
      if (!base.outputPartitioning.isInstanceOf[UnknownPartitioning]) base
      else {
        val phys = qe.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val attrMap = AttributeMap(phys.output.zip(base.output))
        def remap[T <: Expression](e: T): T =
          e.transform { case a: Attribute => attrMap.getOrElse(a, a) }.asInstanceOf[T]
        // flatten a PartitioningCollection to its first leaf like
        // fromDataset does (firstLeafPartitioning): storing collections
        // verbatim would nest them across repeated truncate-join rounds,
        // growing canonicalization cost — the pathology Spark's own
        // guard exists to prevent
        def firstLeaf(p: Partitioning): Partitioning = p match {
          case c: PartitioningCollection => firstLeaf(c.partitionings.head)
          case other => other
        }
        val part: Partitioning = firstLeaf(phys.outputPartitioning) match {
          case u: UnknownPartitioning => u
          case e: Expression with Partitioning => remap(e)
          case other => other
        }
        val ord: Seq[SortOrder] = phys.outputOrdering.map(remap(_))
        if (part.isInstanceOf[UnknownPartitioning]) base
        else {
          // keep the rewritten statistics/constraints fromDataset would
          // have attached (dropping them left every truncated relation
          // at defaultSizeInBytes — un-broadcastable downstream, and a
          // silent plan divergence between the AQE and non-AQE branches)
          val (stats, constraints) =
            LogicalRDD.rewriteStatsAndConstraints(ds.logicalPlan, qe.optimizedPlan)
          LogicalRDD(base.output, rdd, part, ord,
            isStreaming = false)(ds.sparkSession, stats, constraints)
        }
      }
    Dataset.ofRows(ds.sparkSession, out)
  }
}
