package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII redaction (Scrub.redact) and int8 quantization (Similarity.quantizeInt8). */
class ScrubQuantizeSpec extends SparkSpec {

  test("redaction removes every email and phone, leaves clean text intact") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to alice.b@corp.example or +1-555-0100 today"),
      (2L, "two mails a@b.c and d.e@f.gh plus +1-555-9999"),
      (3L, "no pii here at all")
    ).toDF("id", "t").select(col("id"), Scrub.redact(col("t")).as("r"))
    val r = df.collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "write to <EMAIL> or <PHONE> today")
    assert(r(2L) === "two mails <EMAIL> and <EMAIL> plus <PHONE>")
    assert(r(3L) === "no pii here at all")
  }

  test("quantization: max element saturates to exactly ±127, zero vectors drop") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f), 0),
      (2L, Array(0.0f, 0.0f), 0), // all-zero → excluded
      (3L, Array(2.0f), 0) // singleton → q = [127]
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.quantizeInt8(emb)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet === Set(1L, 3L))
    val d1 = r(1L)
    // scale = 1.0/127; q = [round(63.5), -127, round(31.75)] = [64, -127, 32]
    assert(d1.getLong(d1.fieldIndex("q_sum")) === (64L - 127L + 32L))
    assert(d1.getLong(d1.fieldIndex("q_l1")) === (64L + 127L + 32L))
    assert(d1.getLong(d1.fieldIndex("n_sat")) === 1L)
    assert(d1.getLong(d1.fieldIndex("dim")) === 3L)
    val d3 = r(3L)
    assert(d3.getLong(d3.fieldIndex("q_sum")) === 127L)
    assert(d3.getLong(d3.fieldIndex("n_sat")) === 1L)
  }

  test("quantization plan is map-only (no exchange)") {
    import spark.implicits._
    val emb = Seq((1L, Array(0.5f, -1.0f), 0)).toDF("vec_id", "embedding", "label")
    val plan = Similarity.quantizeInt8(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("quantized top-k tracks the float ranking closely on the real corpus") {
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    def topSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("qid", "vec_id"))
    val quant = topSet(Similarity.quantizedTopK(emb, queries, k = 10)
      .select("qid", "vec_id"))
    val overlap = (exact intersect quant).size.toDouble / exact.size
    // int8 quantization may reorder near-ties but must keep most true neighbors
    assert(overlap >= 0.7, f"quantized recall vs float top-10 too low: $overlap%.2f")
  }
}
