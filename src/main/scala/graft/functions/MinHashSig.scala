package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(shingleHashes, numPerm, seed)` — MinHash signature of an
  * `array<bigint>` of shingle hashes: per permutation j, the minimum of the
  * affine rehash `((h mod P) * a_j + b_j) mod P` over all shingles, with
  * P = 2^31 − 1 and seed-fixed coefficients (empty input → P sentinels).
  *
  * The composable formulation unrolls numPerm=128 separate
  * `array_min(transform(...))` aggregate expressions — the generated method
  * is enormous (seconds of Janino compilation per plan) and each lambda body
  * still evaluates interpreted. Here it is one O(shingles × perms) nested
  * loop over an embedded coefficient table, identical arithmetic (pmod
  * semantics included) so signatures match the HOF formulation bit-for-bit.
  */
case class MinHashSig(child: Expression, numPerm: Int, seed: Long)
    extends UnaryExpression {

  require(numPerm >= 1, s"minhash_sig needs numPerm >= 1, got $numPerm")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // Seed-fixed coefficient table, identical to graft.llm.Dedup.coefficients.
  @transient private lazy val coeffs: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = new Array[Long](numPerm)
    val bs = new Array[Long](numPerm)
    var i = 0
    while (i < numPerm) {
      as(i) = math.abs(rnd.nextLong()) % (MinHashSig.Prime - 1) + 1
      bs(i) = math.abs(rnd.nextLong()) % MinHashSig.Prime
      i += 1
    }
    (as, bs)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val (as, bs) = coeffs
    val out = Array.fill(numPerm)(MinHashSig.Prime)
    var k = 0
    while (k < len) {
      val hm = MinHashSig.pmod(arr.getLong(k))
      var j = 0
      while (j < numPerm) {
        val v = (hm * as(j) + bs(j)) % MinHashSig.Prime
        if (v < out(j)) out(j) = v
        j += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", coeffs._1, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", coeffs._2, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      s"""
        final int $len = $c.numElements();
        final long[] $out = new long[$numPerm];
        java.util.Arrays.fill($out, ${MinHashSig.Prime}L);
        for (int $k = 0; $k < $len; $k++) {
          long $hm = $c.getLong($k) % ${MinHashSig.Prime}L;
          if ($hm < 0) $hm += ${MinHashSig.Prime}L;
          for (int $j = 0; $j < $numPerm; $j++) {
            final long $v = ($hm * $asRef[$j] + $bsRef[$j]) % ${MinHashSig.Prime}L;
            if ($v < $out[$j]) $out[$j] = $v;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** 2^31 − 1 (matches graft.llm.Dedup.Prime). */
  val Prime: Long = 2147483647L

  def pmod(x: Long): Long = {
    val m = x % Prime
    if (m < 0) m + Prime else m
  }
}
