package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `xxhash64_array(array<string>)` — element-wise `xxhash64` (seed 42, the
  * `functions.xxhash64` default) as `array<bigint>`, BIT-IDENTICAL to
  * `transform(arr, w -> xxhash64(w))` including the null convention (a null
  * element hashes to the seed).
  *
  * Spark never code-generates higher-order functions: the `transform` lambda
  * evaluates interpreted per element, and that one lambda sat under every
  * shingling call in the dedup/LSH family and the hashed decontamination
  * path. This expression does the same per-element hash inside whole-stage
  * codegen (delegating to XxHash64Function, the exact arithmetic
  * `functions.xxhash64` uses).
  */
case class XxHash64Array(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xxhash64_array needs array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xxhash64_array"

  override protected def nullSafeEval(input: Any): Any =
    XxHash64Array.hashAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.XxHash64Array.hashAll($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XxHash64Array {
  val Seed = 42L

  /** Shared by eval and codegen so the two paths agree by construction. */
  def hashAll(arr: ArrayData): GenericArrayData = {
    val len = arr.numElements()
    val out = new Array[Long](len)
    var i = 0
    while (i < len) {
      // functions.xxhash64 of a null input returns the seed unchanged
      out(i) =
        if (arr.isNullAt(i)) Seed
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }
}
