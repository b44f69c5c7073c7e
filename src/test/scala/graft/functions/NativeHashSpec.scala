package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity specs for the native simhash64 / minhash_sig expressions: codegen
  * vs interpreted, and vs the reference higher-order-function formulations
  * they replaced.
  */
class NativeHashSpec extends SparkSpec {

  test("simhash64 equals the HOF reference formulation") {
    import spark.implicits._
    val df = Seq.tabulate(50)(i => Seq.tabulate(i % 13)(j => (i * 131 + j * 7).toLong))
      .toDF("hashes")
    val native = df.selectExpr("simhash64(hashes) AS s").collect().map(_.getLong(0))
    val hof = df.select(
      aggregate(
        zip_with(
          aggregate(col("hashes"), array_repeat(lit(0L), 64),
            (acc, h) => zip_with(acc, sequence(lit(0), lit(63)), (a, i) =>
              a + when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, 1L)
                .otherwise(-1L))),
          sequence(lit(0), lit(63)),
          (s, i) => when(s > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
        lit(0L), (acc, b) => acc.bitwiseOR(b)).as("s")).collect().map(_.getLong(0))
    assert(native.toSeq === hof.toSeq)
  }

  test("minhash_sig equals the HOF affine-permutation formulation") {
    import spark.implicits._
    val prime = 2147483647L
    val rnd = new scala.util.Random(42L)
    val coeffs = Seq.fill(16)((math.abs(rnd.nextLong()) % (prime - 1) + 1,
      math.abs(rnd.nextLong()) % prime))
    val df = Seq.tabulate(40)(i => Seq.tabulate(i % 9)(j => (i * 997L + j * 13)))
      .toDF("sh")
    val native = df.selectExpr("minhash_sig(sh, 16, 42L) AS sig")
      .collect().map(_.getSeq[Long](0))
    val hof = df.select(array(coeffs.map { case (a, b) =>
      coalesce(array_min(transform(col("sh"),
        h => pmod(pmod(h, lit(prime)) * lit(a) + lit(b), lit(prime)))), lit(prime))
    }: _*).as("sig")).collect().map(_.getSeq[Long](0))
    native.zip(hof).foreach { case (n, h) => assert(n === h) }
  }

  test("minhash_sig interpreted eval matches codegen") {
    val lit0 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq(5L, 99L, 1234567L),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    val viaEval = MinHashSig(lit0, 8, 42L).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    val viaSql = spark.sql("SELECT minhash_sig(array(5L, 99L, 1234567L), 8, 42L) AS s")
      .collect()(0).getSeq[Long](0)
    assert(viaEval === viaSql)
  }

  test("cosine_sim / dot_product equal the fold formulations bit-for-bit") {
    import spark.implicits._
    val df = Seq.tabulate(30)(i =>
      (Seq.tabulate(16)(j => (i * 0.37f + j * 1.13f)), Seq.tabulate(16)(j => (j * 0.71f - i * 0.05f))))
      .toDF("a", "b")
    def fold(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0.0).cast("double"), (acc, x) => acc + x)
    val hof = df.select(
      (fold(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double"))) /
        (sqrt(fold(transform(col("a"), x => x.cast("double") * x.cast("double")))) *
          sqrt(fold(transform(col("b"), x => x.cast("double") * x.cast("double")))))).as("c"),
      fold(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double"))).as("d"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val native = df.selectExpr("cosine_sim(a, b) AS c", "dot_product(a, b) AS d")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(native.toSeq === hof.toSeq)
  }

  test("cosine_sim returns null on length mismatch") {
    val r = spark.sql(
      "SELECT cosine_sim(CAST(array(1.0) AS ARRAY<DOUBLE>), CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>)) AS c")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("empty input yields Prime sentinels (minhash) and zero (simhash)") {
    val sig = spark.sql("SELECT minhash_sig(CAST(array() AS ARRAY<BIGINT>), 4, 42L) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig === Seq.fill(4)(2147483647L))
    val sh = spark.sql("SELECT simhash64(CAST(array() AS ARRAY<BIGINT>)) AS s")
      .collect()(0).getLong(0)
    assert(sh === 0L)
  }
}
