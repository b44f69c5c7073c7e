package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hard-check of the n-gram near-dup family against EXACT pairwise Jaccard
  * (`Dedup.exactNgramJaccardPairs`, the DuckDB-checkable oracle shape):
  *  - precision: every LSH-reported pair must appear in the exact pair set
  *    with the same jaccard (LSH verifies on hashed shingles; hashed and
  *    string shingle sets have identical cardinalities barring xxhash64
  *    collisions);
  *  - recall floor: exact duplicates (identical signatures → identical band
  *    hashes) and high-jaccard pairs must be found.
  */
class DedupExactJaccardSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content about spark engines at scale"),
      (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (5L, "short text"),
      (6L, "one"), // < 2 tokens → empty shingle set
      (7L, "spark engines at scale process content differently")
    ).toDF("doc_id", "text")
  }

  test("LSH pair set is a subset of the exact pair set with matching jaccard") {
    val exact = Dedup.exactNgramJaccardPairs(docs, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.minHashNearDups(docs, threshold = 0.1, shingleSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(lsh.nonEmpty)
    lsh.foreach { case (pair, j) =>
      assert(exact.contains(pair), s"LSH pair $pair not in the exact set — precision < 1")
      // LSH jaccard is rounded to 4 digits by minHashNearDups
      assert(math.abs(exact(pair) - j) < 5e-5, s"jaccard mismatch on $pair: exact=${exact(pair)} lsh=$j")
    }
  }

  test("exact duplicates and high-jaccard pairs are recalled") {
    val lsh = Dedup.minHashNearDups(docs, threshold = 0.1, shingleSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.contains((1L, 4L)), "identical docs must always band together")
    assert(lsh.contains((1L, 2L)), "jaccard ~0.78 pair should be recalled at 32 bands x 4 rows")
  }

  test("empty and sub-2-token docs produce empty shingle sets, no divide-by-zero") {
    val exact = Dedup.exactNgramJaccardPairs(docs, threshold = 0.0)
    // threshold 0.0 admits every pair incl. those with empty shingle sets;
    // jaccard for empty-union pairs is defined 0.0, never an ANSI error
    val j6 = exact.filter(col("doc_a") === 6L || col("doc_b") === 6L)
      .select("jaccard").collect().map(_.getDouble(0))
    assert(j6.nonEmpty && j6.forall(_ === 0.0))
  }

  test("dedupKeepBest keeps the best-quality member, not the min id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // near-dup of 2 and 3 (transitively)
      (2L, "alpha beta gamma delta epsilon zeta"), // longest -> the keeper
      (3L, "alpha beta gamma delta epsilon"),
      (9L, "totally different content here") // isolated -> kept
    ).toDF("doc_id", "text")
    val pairs = Dedup.exactNgramJaccardPairs(docs, threshold = 0.4)
    val r = Dedup.dedupKeepBest(docs,
        graft.llm.TextAnalysis.tokenCount(col("text")).cast("bigint"), pairs)
      .select("doc_id", "component", "kept").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r(1L)._1 == 1L && r(2L)._1 == 1L && r(3L)._1 == 1L,
      s"1,2,3 must share the component labeled by the min id: $r")
    assert(!r(1L)._2 && r(2L)._2 && !r(3L)._2,
      s"the LONGEST member (doc 2) is the representative, not min-id doc 1: $r")
    assert(r(9L) == ((9L, true)), "isolated docs keep themselves")
  }
}
