package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `ngram_strings(words, n)` — every length-`n` sliding window over an
  * `array<string>`, space-joined, as `array<string>`. FULL windows only:
  * fewer than `n` elements → empty array (the decontamination/Jaccard
  * convention — `ngram_hash` keeps the opposite short-doc convention for
  * MinHash signing).
  *
  * Native twin of the composable `transform(sequence(...), i ->
  * concat_ws(' ', slice(words, i, n)))`, which allocates a sliced array per
  * window and runs its lambda interpreted — the dominant cost of the
  * decontamination entries. Here each window is one UTF8String.concatWs
  * inside whole-stage codegen. Output strings are identical to the HOF
  * formulation, so DuckDB oracles keep matching.
  *
  * A window containing a null element is skipped (the token arrays this
  * feeds are produced by split+filter and contain no nulls).
  */
case class NgramStrings(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"ngram_strings window must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_strings needs array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_strings"

  override protected def nullSafeEval(input: Any): Any =
    NgramStrings.grams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramStrings.grams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramStrings {
  private val Space = UTF8String.fromString(" ")

  /** Shared by eval and codegen so the two paths agree by construction. */
  def grams(arr: ArrayData, n: Int): GenericArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new java.util.ArrayList[AnyRef](len - n + 1)
    var i = 0
    while (i + n <= len) {
      if (n == 1) {
        if (!arr.isNullAt(i)) out.add(arr.getUTF8String(i))
      } else {
        val parts = new Array[UTF8String](n)
        var j = 0
        var ok = true
        while (j < n && ok) {
          if (arr.isNullAt(i + j)) ok = false
          else { parts(j) = arr.getUTF8String(i + j); j += 1 }
        }
        if (ok) out.add(UTF8String.concatWs(Space, parts: _*))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
