package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Directed semantics for `Similarity.semanticDedup` (the sweep entry is
  * oracle-checked per row; this pins the keep-first greedy and cell
  * isolation on hand-built vectors where every verdict is obvious).
  */
class SemanticDedupSpec extends SparkSpec {

  private def emb(rows: (Long, Int, Seq[Double])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "label", "embedding")
  }

  test("keep-first greedy: lowest id in a similar group survives, dissimilar cell-mates kept") {
    val corpus = emb(
      (1L, 0, Seq(1.0, 0.0, 0.0)),     // cell 0 keeper
      (2L, 0, Seq(0.999, 0.01, 0.0)),  // ~cos 1 vs id 1 → dup
      (3L, 0, Seq(0.0, 0.9, 0.1)),     // same cell but dissimilar → kept
      (4L, 1, Seq(0.0, 0.0, 1.0)),     // cell 1 keeper
      (5L, 1, Seq(0.0, 0.5, 0.6)))     // cell 1, cos 0.77 vs id 4 → kept at 0.9
    val out = Similarity.semanticDedup(corpus, threshold = 0.9)
      .orderBy("vec_id").collect()
    val verdicts = out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(verdicts === Map(1L -> false, 2L -> true, 3L -> false, 4L -> false, 5L -> false))
    // the flagged row records its best prior similarity; kept rows carry -1
    val sims = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(sims(2L) > 0.99)
    assert(Seq(1L, 3L, 4L, 5L).forall(id => sims(id) == -1.0))
  }

  test("threshold is inclusive and order-stable: equal vectors dedupe to the min id") {
    val corpus = emb(
      (10L, 0, Seq(0.6, 0.8, 0.0)),
      (11L, 0, Seq(0.6, 0.8, 0.0)),
      (12L, 0, Seq(0.6, 0.8, 0.0)))
    val out = Similarity.semanticDedup(corpus, threshold = 1.0)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ===
      Seq((10L, false), (11L, true), (12L, true)))
  }
}
