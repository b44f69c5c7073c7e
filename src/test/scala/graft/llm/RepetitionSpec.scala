package graft.llm

import graft.SparkSpec

/** Repetition signals (TextAnalysis.repetitionSignals): hand-computed counts
  * on degenerate and healthy docs.
  */
class RepetitionSpec extends SparkSpec {

  test("duplicate-word and top-bigram fractions match hand counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"), // 4 words, 1 distinct, 3 identical bigrams
      (2L, "all words here differ"), // no repetition
      (3L, "ab ab cd ab ab cd") // top word 4/6; top bigram "ab ab" 2/5
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs)
      .collect().map(x => x.getLong(0) -> x).toMap

    val d1 = r(1L)
    assert(d1.getLong(d1.fieldIndex("n_words")) === 4L)
    assert(d1.getLong(d1.fieldIndex("n_distinct_words")) === 1L)
    assert(d1.getLong(d1.fieldIndex("n_bigrams")) === 3L)
    assert(d1.getLong(d1.fieldIndex("top_bigram_count")) === 3L)
    assert(d1.getDouble(d1.fieldIndex("dup_word_ratio")) === 0.75)
    assert(d1.getDouble(d1.fieldIndex("top_bigram_ratio")) === 1.0)

    val d2 = r(2L)
    assert(d2.getDouble(d2.fieldIndex("dup_word_ratio")) === 0.0)
    assert(d2.getLong(d2.fieldIndex("top_bigram_count")) === 1L)

    val d3 = r(3L)
    assert(d3.getLong(d3.fieldIndex("top_word_count")) === 4L)
    assert(d3.getLong(d3.fieldIndex("n_bigrams")) === 5L)
    assert(d3.getLong(d3.fieldIndex("top_bigram_count")) === 2L)
    assert(d3.getDouble(d3.fieldIndex("top_bigram_ratio")) === 0.4)
  }
}
