package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Benchmark decontamination (Decontaminate.contaminationReport):
  * n-gram construction guards, string-vs-hashed path agreement, and the
  * broadcast plan shape the 100 TB design depends on.
  */
class DecontaminateSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      // shares the 5-gram "alpha beta gamma delta epsilon" with benchmark doc 100
      (1L, "intro words alpha beta gamma delta epsilon closing words here"),
      // same words, different order → no shared 5-gram
      (2L, "epsilon delta gamma beta alpha and then some other words"),
      (3L, "entirely unrelated content with no benchmark overlap at all"),
      (4L, "tiny doc"), // < 5 words → zero grams, clean by definition
      // contains TWO distinct benchmark grams (overlapping window)
      (5L, "alpha beta gamma delta epsilon zeta trailing content words here")
    ).toDF("doc_id", "text")
  }

  private def benchmark = {
    import spark.implicits._
    Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "benchmark only vocabulary nothing shared")
    ).toDF("doc_id", "text")
  }

  test("contamination report flags exactly the docs sharing a 5-gram") {
    val r = Decontaminate.contaminationReport(corpus, benchmark, n = 5)
      .orderBy("doc_id").collect()
    val byId = r.map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(byId.keySet === Set(1L, 2L, 3L, 4L, 5L), "every corpus doc reports")
    assert(byId(1L)._3 && byId(1L)._2 === 1L)
    assert(!byId(2L)._3, "reordered words share no 5-gram")
    assert(!byId(3L)._3)
    assert(byId(4L) === ((0L, 0L, false)), "short doc has zero grams and is clean")
    // doc 5 contains both benchmark 5-grams (windows 1 and 2 of the benchmark doc)
    assert(byId(5L)._3 && byId(5L)._2 === 2L, s"doc 5: ${byId(5L)}")
  }

  test("hashed-gram scale path flags the identical doc set with identical counts") {
    val s = Decontaminate.contaminationReport(corpus, benchmark, n = 5)
      .select("doc_id", "n_grams", "n_contaminated").orderBy("doc_id").collect().toSeq
    val h = Decontaminate.contaminationReport(corpus, benchmark, n = 5, hashGrams = true)
      .select("doc_id", "n_grams", "n_contaminated").orderBy("doc_id").collect().toSeq
    assert(s === h)
  }

  test("wordNgrams guards short docs (sequence would generate descending)") {
    import spark.implicits._
    val g = Seq(("a b c d", 0L), ("a b c d e", 1L), ("a  b   c d e f", 2L))
      .toDF("text", "id")
      .select(col("id"), Decontaminate.wordNgrams(col("text"), 5).as("g"))
      .orderBy("id").collect()
    assert(g(0).getSeq[String](1) === Seq.empty, "4 words < n=5 → no grams")
    assert(g(1).getSeq[String](1) === Seq("a b c d e"))
    assert(g(2).getSeq[String](1) === Seq("a b c d e", "b c d e f"),
      "whitespace runs collapse to single split")
  }

  test("benchmark side is broadcast — the corpus is never shuffled for the probe") {
    val plan = Decontaminate.contaminationReport(corpus, benchmark, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe join:\n$plan")
  }

  test("novelty: first owner keeps full credit, copies score zero, short docs are safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), // 2 distinct 5-grams, both first-seen here
      (2L, "a b c d e f"), // exact copy -> 0 novel
      (3L, "a b c d e zz"), // shares gram "a b c d e" with doc 1, adds 1 new
      (4L, "too short") // no full 5-gram window
    ).toDF("doc_id", "text")
    val r = Decontaminate.noveltyReport(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(x.fieldIndex("novelty"))))).toMap
    assert(r(1L) === ((2L, 2L, 1.0)))
    assert(r(2L) === ((2L, 0L, 0.0)), "an exact copy has zero novelty")
    assert(r(3L) === ((2L, 1L, 0.5)), "the shared gram belongs to doc 1")
    assert(r(4L) === ((0L, 0L, 0.0)), "short docs report zero grams, not NaN")
  }
}
