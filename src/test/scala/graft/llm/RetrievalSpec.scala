package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 scoring (Retrieval.bm25): ranking behavior on a hand-built corpus
  * plus the map-only plan shape (no shuffle between the stats broadcast and
  * the scoring projection). Cross-engine value parity is the DuckDB oracle's
  * job (retrieval_bm25 hash check).
  */
class RetrievalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "table table table scan filter"), // tf(table)=3
      (2L, "table scan filter group sort"), // tf(table)=1
      (3L, "scan filter group sort window"), // tf(table)=0
      (4L, "merge table merge scan merge"), // tf(merge)=3, tf(table)=1
      (5L, "")
    ).toDF("doc_id", "text")
  }

  test("score is monotone in tf; zero-match docs score 0; empty docs are safe") {
    val r = Retrieval.bm25(docs, Seq("table", "merge"))
      .collect().map(x => x.getLong(0) -> x).toMap
    def score(id: Long) = r(id).getDouble(r(id).fieldIndex("bm25"))
    assert(score(1L) > score(2L), "3 occurrences outrank 1 at equal dl")
    assert(score(3L) === 0.0, "no query terms → 0")
    assert(score(5L) === 0.0, "empty doc → 0 (no NaN from dl=0)")
    assert(score(4L) > score(2L), "3×merge (rarer) + 1×table outranks 1×table")
    assert(r(1L).getLong(r(1L).fieldIndex("tf_table")) === 3L)
    assert(r(5L).getLong(r(5L).fieldIndex("dl")) === 0L)
  }

  test("rarer terms carry higher idf: one merge outranks one table") {
    import spark.implicits._
    // 4 docs contain "table", 1 contains "merge"; probe docs have equal dl
    val corpus = Seq(
      (1L, "table a b c"), (2L, "table d e f"), (3L, "table g h i"),
      (10L, "table x y z"), (11L, "merge x y z")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25(corpus, Seq("table", "merge"))
      .collect().map(x => x.getLong(0) -> x.getDouble(x.fieldIndex("bm25"))).toMap
    assert(r(11L) > r(10L))
  }

  test("hybrid RRF fuses keyword and vector ranks; absent ranks report 0") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "nothing relevant here"),
      (1L, "table table table scan"), // bm25 rank 1
      (2L, "table scan filter sort"), // bm25 rank 2
      (3L, "scan filter group sort"), // keyword miss, vector rank 3
      (4L, "group sort window scan") // keyword miss, zero vector -> excluded
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), // the query vector
      (1L, Seq(1.0f, 0.0f)), // cos rank 1 (sim 1)
      (2L, Seq(0.9f, 0.1f)), // cos rank 2
      (3L, Seq(0.0f, 1.0f)), // cos rank 3 (sim 0 ranks, not excluded)
      (4L, Seq(0.0f, 0.0f)) // NaN cosine -> excluded from the vector pool
    ).toDF("vec_id", "embedding")
    val r = Retrieval.hybridRrf(corpus, emb, Seq("table"), poolK = 3, k = 10)
      .collect().map(x => x.getLong(0) -> x).toMap
    def rrf(id: Long) = r(id).getDouble(r(id).fieldIndex("rrf"))
    def rank(id: Long, c: String) = r(id).getLong(r(id).fieldIndex(c))
    assert(r.keySet === Set(1L, 2L, 3L), "union of the two pools, minus NaN")
    assert(rrf(1L) === BigDecimal(2.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rrf(2L) === BigDecimal(2.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rrf(3L) === BigDecimal(1.0 / 63).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rrf(1L) > rrf(2L) && rrf(2L) > rrf(3L), "both-pool docs outrank single-pool")
    assert(rank(3L, "bm25_rank") === 0L && rank(3L, "cos_rank") === 3L,
      "a keyword miss reports bm25_rank 0 but keeps its vector rank")
  }

  test("hybrid branches plan as TakeOrdered partial top-k, no cartesian join") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = Retrieval.hybridRrf(docs, emb, Retrieval.QueryTerms)
      .queryExecution.executedPlan.toString
    assert("TakeOrderedAndProject".r.findAllIn(plan).size >= 2,
      s"both pool reductions must be partial top-k, not global sorts:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row query vector must broadcast, never cartesian:\n$plan")
  }

  test("scoring is map-only after the one-row stats broadcast") {
    val plan = Retrieval.bm25(docs, Retrieval.QueryTerms)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats row must broadcast:\n$plan")
    // the corpus side reaches the join without any hash-partition exchange
    assert(!plan.contains("hashpartitioning"), s"unexpected corpus shuffle:\n$plan")
  }
}
