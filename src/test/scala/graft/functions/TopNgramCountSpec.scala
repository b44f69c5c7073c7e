package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class TopNgramCountSpec extends SparkSpec {

  test("registered via GraftExtensions and callable from SQL") {
    val r = spark.sql(
      "SELECT top_ngram_count(array('a','b','a','b','a'), 1) AS w," +
        " top_ngram_count(array('a','b','a','b','a'), 2) AS b")
      .collect()(0)
    assert(r.getLong(0) === 3L) // 'a' ×3
    assert(r.getLong(1) === 2L) // 'a b' ×2
  }

  test("window semantics: short inputs count 0, singleton window counts itself") {
    val r = spark.sql(
      "SELECT top_ngram_count(array('x'), 2) AS short," +
        " top_ngram_count(array('x'), 1) AS one," +
        " top_ngram_count(CAST(array() AS ARRAY<STRING>), 1) AS empty")
      .collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 1L)
    assert(r.getLong(2) === 0L)
  }

  test("interpreted eval and whole-stage codegen agree") {
    import spark.implicits._
    val df = Seq.tabulate(80)(i =>
      Seq.tabulate(i % 13)(j => s"w${(i * 7 + j * j) % 5}")).toDF("ws")
    for (n <- Seq(1, 2, 3)) {
      val viaCodegen = df.selectExpr(s"top_ngram_count(ws, $n) AS c")
        .collect().map(_.getLong(0))
      val viaEval = df.collect().map { row =>
        TopNgramCount(Literal.create(row.getSeq[String](0), ArrayType(StringType)), n)
          .eval(null).asInstanceOf[Long]
      }
      assert(viaCodegen.toSeq === viaEval.toSeq, s"n=$n")
    }
  }

  test("counts equal the group-by mode over wordNgrams strings") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "ab cd ab cd ab ef gh"),
      (2L, "one two three"),
      (3L, "x x x x")
    ).toDF("doc_id", "text")
    val viaNative = docs.select(col("doc_id"),
      call_function("top_ngram_count",
        filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= ""), lit(2)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaGroupBy = docs.select(col("doc_id"),
        explode(graft.llm.Decontaminate.wordNgrams(col("text"), 2)).as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(max("count").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaNative(1L) === viaGroupBy(1L))
    assert(viaNative(2L) === viaGroupBy(2L))
    assert(viaNative(3L) === viaGroupBy(3L))
  }

  test("null window elements are skipped, not counted or crashed") {
    val arr = ArrayData.toArrayData(Array[AnyRef](
      UTF8String.fromString("a"), null, UTF8String.fromString("a"),
      UTF8String.fromString("a")))
    assert(TopNgramCount.topCount(arr, 1) === 3L)
    assert(TopNgramCount.topCount(arr, 2) === 1L) // only ("a","a") at the tail
  }
}
