package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-name registration for native AGGREGATE functions: `spark.udf`
  * cannot install a TypedImperativeAggregate, so this goes through the
  * session's FunctionRegistry (private[sql] — hence the package). The
  * analyzer wraps a returned AggregateFunction in its
  * AggregateExpression exactly as for built-in aggregates.
  */
object AggRegistrar {

  /** `kmv_distinct(value, k)` — k must be an INTEGER LITERAL (it sizes
    * the aggregation buffer, which must be known at plan time).
    */
  def registerKmv(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct",
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"kmv_distinct(value, k) takes 2 arguments, got ${exprs.length}")
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            "kmv_distinct: k must be an integer literal (it sizes the " +
              s"aggregation buffer), got $other")
        }
        KmvSketchAgg(exprs.head, k)
      },
      "scala_udf")
}
