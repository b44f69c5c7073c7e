package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `zorder_bucket(v, sorted_bounds)` — the number of bounds `b` with
  * `v >= b` under Spark SQL's double ordering (NaN greatest, -0.0 == 0.0):
  * the quantile-bucket id of `v` against the sorted cut-point array that
  * the z-order rewrite samples per column.
  *
  * This is the z-value hot path (Maintenance.bucketOf): the previous
  * `aggregate`-HOF fold over the 255-element literal ran an interpreted
  * lambda per element per row per dimension — ~10 s of task time for a
  * 100k-row two-column rewrite, and linear in table size at scale. The
  * native binary search is O(log bounds) per row inside whole-stage
  * codegen. Bounds are non-decreasing by construction (approxQuantile at
  * ascending probabilities), with any NaN cuts at the end (NaN sorts
  * greatest), so the `v >= b` predicate is monotone over the array and the
  * search returns exactly the fold's count.
  */
case class ZorderBucket(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (DoubleType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zorder_bucket needs (double, array<double>), got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "zorder_bucket"

  override protected def nullSafeEval(v: Any, bounds: Any): Any =
    ZorderBucket.count(v.asInstanceOf[Double], bounds.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b) =>
      s"${ev.value} = graft.functions.ZorderBucket.count($v, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZorderBucket {
  /** Shared by eval and codegen so the two paths agree by construction.
    * Replicates Spark SQL double comparison: NaN >= anything; -0.0 == 0.0
    * falls out of Java `>=` for the non-NaN branch.
    */
  def count(v: Double, bounds: ArrayData): Int = {
    val n = bounds.numElements()
    if (java.lang.Double.isNaN(v)) return n // NaN >= every bound, NaN included
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val b = bounds.getDouble(mid)
      val ge = !java.lang.Double.isNaN(b) && v >= b
      if (ge) lo = mid + 1 else hi = mid
    }
    lo
  }
}
