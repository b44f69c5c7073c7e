package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to two `private[sql]` seams the SQL-DML router needs (the same
  * integration points Delta Lake and Iceberg's Spark runtime use from their
  * own `org.apache.spark.sql.*` packages):
  *
  *  - `Dataset.ofRows`: turn a PARSED (unresolved) logical plan — e.g. the
  *    `USING (...)` subquery of a MERGE statement — into a DataFrame,
  *    letting the session's analyzer resolve temp views, VALUES lists, and
  *    functions exactly as `spark.sql` would;
  *  - `ExpressionUtils.column`: wrap a catalyst `Expression` back into a
  *    public `Column` after qualifier rewriting (Spark 4 removed the public
  *    `Column(expr)` constructor).
  *
  * Kept to these two one-liners so the engine's dependency on non-public
  * API stays auditable in one place.
  */
object SqlInternals {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
