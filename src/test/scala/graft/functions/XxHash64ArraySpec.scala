package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class XxHash64ArraySpec extends SparkSpec {

  test("bit-identical to transform(arr, w -> xxhash64(w)), nulls hash to the seed") {
    import spark.implicits._
    val df = (Seq.tabulate(60)(i => Seq.tabulate(i % 9)(j => s"tok${i * 13 + j}")) :+
      Seq("x", null, "y")).toDF("ws")
    val viaNative = df.selectExpr("xxhash64_array(ws) AS h")
      .collect().map(_.getSeq[Long](0))
    val viaTransform = df.select(transform(col("ws"), w => xxhash64(w)).as("h"))
      .collect().map(_.getSeq[Long](0))
    viaNative.zip(viaTransform).foreach { case (a, b) => assert(a === b) }
  }

  test("interpreted eval and whole-stage codegen agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import spark.implicits._
    val df = Seq(Seq("a", "bb", "ccc"), Seq.empty[String]).toDF("ws")
    val viaCodegen = df.selectExpr("xxhash64_array(ws) AS h")
      .collect().map(_.getSeq[Long](0))
    val viaEval = df.collect().map { row =>
      XxHash64Array(Literal.create(row.getSeq[String](0), ArrayType(StringType)))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    viaCodegen.zip(viaEval).foreach { case (a, b) => assert(a.toSeq === b) }
  }
}
