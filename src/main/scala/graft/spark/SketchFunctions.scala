package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ExprBridge, KmvSketchAgg}

/** Column wrappers for the native sketch aggregates. */
object SketchFunctions {

  /** KMV distinct-count estimate of `c` (stringly hashed) with sketch
    * size `k`: exact below k distinct values, `(k−1)/kth·2^48` above —
    * deterministic under any partitioning, ~k·8 B of aggregate state
    * per group (see [[org.apache.spark.sql.graft.KmvSketchAgg]]).
    */
  def kmvDistinct(c: Column, k: Int): Column =
    ExprBridge.column(
      KmvSketchAgg(ExprBridge.expression(c), k).toAggregateExpression())
}
