package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NGramHashSpec extends SparkSpec {

  test("registered via GraftExtensions and callable from SQL") {
    val r = spark.sql("SELECT ngram_hash(array(1L, 2L, 3L, 4L), 2) AS g")
      .collect()(0).getSeq[Long](0)
    assert(r.length === 3) // windows [1,2] [2,3] [3,4]
    assert(r.distinct.length === 3)
  }

  test("interpreted eval and whole-stage codegen agree bit-for-bit") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => Seq.tabulate(i % 17)(j => (i * 31 + j).toLong))
      .toDF("hashes")
    val viaCodegen = df.selectExpr("ngram_hash(hashes, 3) AS g").collect().map(_.getSeq[Long](0))
    val viaEval = df.collect().map { row =>
      val in = row.getSeq[Long](0)
      NGramHash(org.apache.spark.sql.catalyst.expressions.Literal.create(
        in, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)), 3)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    }
    viaCodegen.zip(viaEval).foreach { case (a, b) => assert(a === b) }
  }

  test("window semantics: short inputs collapse to one gram, empty to none") {
    val short = spark.sql("SELECT ngram_hash(array(7L, 8L), 4) AS g")
      .collect()(0).getSeq[Long](0)
    assert(short.length === 1)
    val empty = spark.sql("SELECT ngram_hash(CAST(array() AS ARRAY<BIGINT>), 4) AS g")
      .collect()(0).getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("misuse raises analysis errors, not runtime surprises") {
    val typeErr = intercept[Exception](
      spark.sql("SELECT ngram_hash(array('a','b'), 2)").collect())
    assert(typeErr.getMessage.contains("array<bigint>"))
    val nonLit = intercept[Exception](
      spark.sql("SELECT ngram_hash(array(1L), 1+1)").collect())
    assert(nonLit.getMessage.toLowerCase.contains("literal"))
  }

  test("different windows or contents give different hashes (sanity)") {
    val a = spark.sql("SELECT ngram_hash(array(1L,2L,3L), 2)[0]").collect()(0).getLong(0)
    val b = spark.sql("SELECT ngram_hash(array(2L,1L,3L), 2)[0]").collect()(0).getLong(0)
    assert(a !== b) // order-sensitive
  }
}
