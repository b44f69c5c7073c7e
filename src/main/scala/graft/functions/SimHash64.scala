package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `simhash64(wordHashes)` — 64-bit SimHash of an `array<bigint>` of word
  * hashes: bit i is set iff Σ over words of (+1 if word-hash bit i set,
  * else −1) is positive.
  *
  * The composable formulation (`aggregate` + `zip_with` over a 64-counter
  * array) runs as *interpreted* higher-order lambdas — Spark does not codegen
  * HOF bodies — costing ~64 boxed operations per word. This native expression
  * is the same computation as two tight unboxed loops inside whole-stage
  * codegen (measured ~4× on the sf0.1 corpus), with eval and codegen paths
  * bit-identical.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val counters = new Array[Int](64)
    var k = 0
    while (k < len) {
      val h = arr.getLong(k)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
        i += 1
      }
      k += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val len = ctx.freshName("len")
      val counters = ctx.freshName("counters")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
        final int $len = $c.numElements();
        final int[] $counters = new int[64];
        for (int $k = 0; $k < $len; $k++) {
          final long $h = $c.getLong($k);
          for (int $i = 0; $i < 64; $i++) {
            if ((($h >>> $i) & 1L) == 1L) $counters[$i]++; else $counters[$i]--;
          }
        }
        long $sig = 0L;
        for (int $i = 0; $i < 64; $i++) {
          if ($counters[$i] > 0) $sig |= (1L << $i);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
