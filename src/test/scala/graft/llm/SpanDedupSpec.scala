package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact duplicate-span containment (the Lee et al. exact-substring shape)
  * and the deterministic shuffle/split.
  */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  // doc 1 owns its spans; doc 2 copies doc 1 verbatim plus a tail; doc 3 is
  // fresh; doc 4 is too short to carry any 4-word span
  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, "one two three four five six"),
    (4L, "just three words")
  ).toDF("doc_id", "text")

  test("spans owned by an earlier doc are counted, owners stay clean") {
    val stats = Dedup.spanDupStats(corpus, k = 4)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    // doc 1: 3 spans, all self-owned; doc 2: 5 spans, 3 inherited from doc 1;
    // doc 3: 3 fresh spans; doc 4: absent (no 4-word span)
    assert(stats === Array(
      (1L, 3L, 0L, 0.0), (2L, 5L, 3L, 0.6), (3L, 3L, 0L, 0.0)))
  }

  test("hashed scale path produces the identical output frame") {
    val s = Dedup.spanDupStats(corpus, k = 4).orderBy("doc_id").collect()
    val h = Dedup.spanDupStatsHashed(corpus, k = 4).orderBy("doc_id").collect()
    assert(s === h)
  }

  test("span stats are partitioning-invariant") {
    val a = Dedup.spanDupStats(corpus, k = 4).orderBy("doc_id").collect()
    val b = Dedup.spanDupStats(corpus.repartition(7), k = 4).orderBy("doc_id").collect()
    assert(a === b)
  }

  test("repeated spans WITHIN one doc count once (distinct spans per doc)") {
    val docs = Seq(
      (1L, "a b c d a b c d a b c d"), // span "a b c d" repeats internally
      (2L, "a b c d x y z w")
    ).toDF("doc_id", "text")
    val stats = Dedup.spanDupStats(docs, k = 4)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    // doc 2 inherits exactly ONE dup span from doc 1, not three
    assert(stats(1)._1 === 2L && stats(1)._3 === 1L)
  }

  test("shuffleSplit: splits partition the corpus, ids decide membership") {
    val docs = (0L until 400L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val out = Sampling.shuffleSplit(docs, epochSeed = 7L, testPct = 10, valPct = 5)
    val bySplit = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.values.sum === 400L)
    assert(bySplit("test") > 15L && bySplit("test") < 90L) // ~10% ± hash noise
    // content edits never move a doc across splits (id-keyed, not text-keyed)
    val edited = (0L until 400L).map(i => (i, s"EDITED $i")).toDF("doc_id", "text")
    val a = out.select("doc_id", "split").as[(Long, String)].collect().sorted
    val b = Sampling.shuffleSplit(edited, 7L, 10, 5)
      .select("doc_id", "split").as[(Long, String)].collect().sorted
    assert(a === b)
  }

  test("shuffleSplit: a new epoch seed is a fresh permutation; same seed is stable") {
    val docs = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    def keys(seed: Long) = Sampling.shuffleSplit(docs, seed, 0, 0)
      .select("doc_id").as[Long].collect().toSeq
    assert(keys(1L) === keys(1L))
    assert(keys(1L) !== keys(2L))
  }

  test("prepareCorpusV2: hashed-span default produces exactly the string-span output") {
    // the shipping path keys spans by the 8-byte rolling hash; the oracle
    // entry recomputes with string grams — the full composed output (decon
    // survivors AND split labels) must be identical either way
    val docs = (0L until 60L).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      val text =
        if (i % 7 == 0) "shared boilerplate prefix that repeats verbatim across documents " +
          s"followed by unique suffix number $i with several more words to pass quality"
        else s"document $i carries its own distinct words " +
          s"sufficiently many of them to pass the quality filter thresholds easily $i"
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
    val hashed = Pipeline.prepareCorpusV2(docs)
      .select("doc_id", "lang", "split").as[(Long, String, String)].collect().sorted
    val strings = Pipeline.prepareCorpusV2(docs, hashedSpans = false)
      .select("doc_id", "lang", "split").as[(Long, String, String)].collect().sorted
    assert(hashed === strings)
    assert(hashed.nonEmpty)
  }

  test("shuffleSplit plans a range-partitioned sort, never a single-task stage") {
    val docs = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val plan = Sampling.shuffleSplit(docs, 7L, 10, 5).queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), s"global order must stay distributed:\n$plan")
  }
}
