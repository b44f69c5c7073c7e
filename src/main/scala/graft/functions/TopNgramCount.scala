package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `top_ngram_count(words, n)` — occurrence count of the MOST FREQUENT
  * length-`n` sliding window over an `array<string>`, as bigint. Only full
  * windows count: fewer than `n` elements → 0.
  *
  * This is the repetition-signal hot path (TextAnalysis.repetitionSignals):
  * the per-doc mode count is a pure row-local computation, but both
  * composable formulations regress it — explode + two groupBys shuffles the
  * whole token stream twice (slowest entry of the round-8 sweep at 4.7 s),
  * and an `aggregate`-HOF fold over `array_sort` runs an interpreted lambda
  * per element plus an interpreted comparator per sort step (7.6 s). A
  * native expression with a per-row HashMap count is one O(len) pass inside
  * whole-stage codegen.
  *
  * Window identity is the exact words joined by a single space, so counts
  * equal those over `Decontaminate.wordNgrams` strings (words are split on
  * whitespace and can't contain spaces — the mapping is bijective and the
  * DuckDB oracle agrees). A window containing a null element is skipped.
  */
case class TopNgramCount(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"top_ngram_count window must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_ngram_count needs array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "top_ngram_count"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    TopNgramCount.topCount(arr, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopNgramCount.topCount($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopNgramCount {
  private val Space = UTF8String.fromString(" ")

  /** Shared by eval and codegen so the two paths agree by construction. */
  def topCount(arr: ArrayData, n: Int): Long = {
    val len = arr.numElements()
    if (len < n) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer](len * 2)
    var best = 0L
    var i = 0
    while (i + n <= len) {
      var key: UTF8String = null
      if (n == 1) {
        if (!arr.isNullAt(i)) key = arr.getUTF8String(i)
      } else {
        val parts = new Array[UTF8String](n)
        var j = 0
        var ok = true
        while (j < n && ok) {
          if (arr.isNullAt(i + j)) ok = false
          else { parts(j) = arr.getUTF8String(i + j); j += 1 }
        }
        if (ok) key = UTF8String.concatWs(Space, parts: _*)
      }
      if (key != null) {
        val prev = counts.get(key)
        val cnt = if (prev == null) 1 else prev + 1
        counts.put(key, cnt)
        if (cnt > best) best = cnt.toLong
      }
      i += 1
    }
    best
  }
}
