package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bigram-LM perplexity (LangModel.perplexity): the smoothed probabilities
  * on a hand-computed corpus, ordering behavior (rare text scores high),
  * edge rows, and the join plan shape. Cross-engine value parity is the
  * DuckDB oracle's job (text_lm_perplexity hash check).
  */
class LangModelSpec extends SparkSpec {

  test("hand-computed add-one smoothed bigram model") {
    import spark.implicits._
    // corpus: "a a" and "a b"
    // counts: (<s>,a)=2 (a,a)=1 (a,</s>)=1 (a,b)=1 (b,</s>)=1
    // contexts: <s>=2 a=3 b=1; V = |{a, b, </s>}| = 3
    val docs = Seq((1L, "a a"), (2L, "a b")).toDF("doc_id", "text")
    val r = LangModel.perplexity(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) === 3L && r(2L).getLong(1) === 3L, "n_trans = words + 1")
    // d1: P = 3/5, 2/6, 2/6 -> addends round(log2 p, 6)
    val lp = Seq(3.0 / 5, 2.0 / 6, 2.0 / 6).map(p =>
      BigDecimal(math.log(p) / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val ce = -BigDecimal(lp.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble / 3
    assert(r(1L).getDouble(r(1L).fieldIndex("cross_entropy")) ===
      BigDecimal(ce).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(1L).getDouble(r(1L).fieldIndex("ppl")) ===
      BigDecimal(math.pow(2.0, ce)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // d2 ends with the likelier (b,</s>)=1/2 vs d1's (a,</s>)=1/3
    assert(r(2L).getDouble(r(2L).fieldIndex("ppl")) <
      r(1L).getDouble(r(1L).fieldIndex("ppl")))
  }

  test("rare-word documents score far above the corpus norm; empty docs are safe") {
    import spark.implicits._
    val common = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val docs = (common :+ (98L -> "zq xv jk qqj vxk") :+ (99L -> "")).toDF("doc_id", "text")
    val r = LangModel.perplexity(docs).collect()
      .map(x => x.getLong(0) -> x.getDouble(x.fieldIndex("ppl"))).toMap
    assert(r(98L) > 3 * r(1L), "gibberish perplexity dwarfs boilerplate")
    val empty = r(99L)
    assert(!empty.isNaN && empty > 0, "empty doc scores its one <s>-></s> transition")
  }

  test("scoring joins narrow model tables; the vocab scalar broadcasts") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = LangModel.perplexity(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"1-row vocab must broadcast, never cartesian:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"vocab scalar should broadcast:\n$plan")
  }
}
