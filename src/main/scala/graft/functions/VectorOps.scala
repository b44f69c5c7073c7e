package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared machinery for binary vector expressions over `array<float>` /
  * `array<double>` columns: per-element accessors chosen from the child type,
  * accumulation always in double.
  *
  * Why native: the composable `zip_with`+`aggregate` formulations execute as
  * interpreted lambdas (Spark does not codegen HOF bodies) — ~6 boxed calls
  * per element. These expressions are tight unboxed loops inside whole-stage
  * codegen, with eval/codegen bit-identical and accumulation order matching
  * the HOF fold (sequential), so DuckDB oracle parity is preserved.
  */
trait VectorBinaryExpression extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<float|double>, got ${l.simpleString}, ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elem(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case ArrayType(FloatType, _) => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** Java accessor snippet for codegen, by child array element type. */
  protected def elemCode(v: String, dt: DataType, i: String): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $v.getFloat($i)"
    case _ => s"$v.getDouble($i)"
  }
}

/** `dot_product(a, b)` — Σ a_i·b_i in double; null on length mismatch. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { acc += elem(a, left.dataType, i) * elem(b, right.dataType, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
        if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
        else {
          final int $n = $a.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ${elemCode(a, left.dataType, i)} * ${elemCode(b, right.dataType, i)};
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `cosine_sim(a, b)` — dot/(|a|·|b|) in double, accumulators sequential like
  * the fold formulation (and DuckDB's list_cosine_similarity over DOUBLE[]);
  * null on length mismatch.
  */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = elem(a, left.dataType, i); val y = elem(b, right.dataType, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
        if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
        else {
          final int $n = $a.numElements();
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double $x = ${elemCode(a, left.dataType, i)};
            final double $y = ${elemCode(b, right.dataType, i)};
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
