package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `ngram_hash(wordHashes, n)` — combined hash of every length-`n` sliding
  * window over an `array<bigint>` of word hashes, as `array<bigint>`.
  *
  * This is the shingling hot path of MinHash dedup (graft.llm.Dedup): the
  * composable-functions formulation (`transform(sequence(...), i ->
  * xxhash64(concat_ws(' ', slice(words, i+1, n))))`) allocates a sliced array
  * AND a concatenated string per gram — O(gram length) garbage per shingle,
  * billions of allocations at corpus scale. A native expression with codegen
  * does it with two long-mixing operations per (window × element) and one
  * primitive array per row: no strings, no sub-arrays, stays inside
  * whole-stage codegen.
  *
  * Mixing: FNV-1a over the window elements + a murmur-style finalizer
  * (identical in eval and doGenCode — the interpreted and codegen paths must
  * agree bit-for-bit).
  *
  * Windows: one per start offset while a full window fits; if the input is
  * shorter than `n` (but non-empty), a single window over all elements.
  */
case class NGramHash(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"ngram_hash window must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hash needs array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Long])
    val m = math.max(1, len - n + 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = NGramHash.FnvOffset
      var j = i
      val end = math.min(i + n, len)
      while (j < end) {
        acc = (acc ^ arr.getLong(j)) * NGramHash.FnvPrime
        j += 1
      }
      out(i) = NGramHash.fmix(acc)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      s"""
        final int $len = $c.numElements();
        final int $m = $len == 0 ? 0 : java.lang.Math.max(1, $len - $n + 1);
        final long[] $out = new long[$m];
        for (int $i = 0; $i < $m; $i++) {
          long $acc = ${NGramHash.FnvOffset}L;
          final int $end = java.lang.Math.min($i + $n, $len);
          for (int $j = $i; $j < $end; $j++) {
            $acc = ($acc ^ $c.getLong($j)) * ${NGramHash.FnvPrime}L;
          }
          $acc ^= $acc >>> 33;
          $acc *= ${NGramHash.Fmix1}L;
          $acc ^= $acc >>> 33;
          $out[$i] = $acc;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramHash {
  val FnvOffset: Long = 0xcbf29ce484222325L
  val FnvPrime: Long = 0x100000001b3L
  val Fmix1: Long = 0xff51afd7ed558ccdL

  def fmix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= Fmix1
    x ^= x >>> 33
    x
  }
}
