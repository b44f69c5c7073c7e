package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge-input hardening for the text/dedup/similarity operators: empty and
  * degenerate documents must flow through every pipeline without nulls or
  * exceptions (at corpus scale there is ALWAYS an empty doc somewhere).
  */
class LlmEdgeSpec extends SparkSpec {

  private def degenerateDocs = {
    import spark.implicits._
    Seq(
      (1L, ""),                      // empty
      (2L, "   "),                   // whitespace only
      (3L, "word"),                  // single word < any shingle size
      (4L, "!!! ??? ..."),           // punctuation only → zero words
      (5L, "a b a b a b a b"))       // tiny but shingle-able
      .toDF("doc_id", "text")
  }

  test("dedup pipelines survive empty and degenerate documents") {
    val exact = Dedup.exactGroups(degenerateDocs).collect()
    assert(exact.length === 5) // all contents distinct
    val near = Dedup.minHashNearDups(degenerateDocs, threshold = 0.1).collect()
    // docs 1/2/4 all have EMPTY shingle sets → identical minhash signatures;
    // they become candidates but jaccard is 0/0 → NaN, filtered by threshold
    assert(near.forall(r => !r.getDouble(2).isNaN))
    val sim = degenerateDocs.select(col("doc_id"), Dedup.simHash(col("text")).as("s")).collect()
    assert(sim.count(_.getLong(1) == 0L) >= 3) // wordless docs hash to 0
  }

  test("quality filter rejects degenerate documents with auditable flags") {
    val flags = TextAnalysis.qualityFilter(degenerateDocs)
      .select("doc_id", "quality_pass", "ok_word_count", "ok_symbols").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    // every degenerate doc fails, each for an identifiable reason
    assert(flags.values.forall(!_._1))
    assert(!flags(1L)._2) // empty: word count
    assert(!flags(4L)._3) // punctuation-only: symbol ratio
  }

  test("text analysis yields sane values on degenerate documents") {
    val stats = degenerateDocs.select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("tok"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.fingerprint(col("text")).as("fp")).collect()
    assert(stats.forall(r => !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3)))
    // empty and whitespace-only normalize to the same fingerprint
    val fps = stats.map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) === fps(4L)) // punctuation strips to empty too
  }

  test("minhash-LSH finds planted near-duplicates and skips unrelated docs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then runs far away " +
      "into the deep dark forest where nobody ever goes at night"
    val docs = (
      Seq(
        (100L, base),
        (101L, base.replace("lazy", "sleepy")),           // near-dup of 100
        (102L, base + " extra trailing words here"),      // near-dup of 100
        (103L, "completely different content about spark catalyst optimizer " +
          "rules and whole stage code generation pipelines running fast")) ++
        (0L until 20L).map(i => (i, s"filler document number $i with its own " +
          s"unique vocabulary token$i word${i * 7} term${i * 13}")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashNearDups(docs, threshold = 0.4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)), s"missed planted near-dup: $pairs")
    assert(pairs.contains((100L, 102L)), s"missed planted near-dup: $pairs")
    assert(!pairs.exists(p => p._1 == 103L || p._2 == 103L),
      s"false positive on unrelated doc: $pairs")
  }

  test("connected components resolve transitive near-dup chains to min labels") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components converge on a deep duplicate chain and fail loudly at the cap") {
    import spark.implicits._
    // a 40-hop chain: plain one-hop min-label propagation would need ~40
    // rounds (the old maxIter=10 silently returned split components here);
    // pointer jumping must converge in O(log d) — well under 12 rounds
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain, maxIter = 12)
    assert(labels.count() === 41)
    assert(labels.agg(org.apache.spark.sql.functions.max("label"))
      .collect()(0).getLong(0) === 0L, "all chain members must fold to the min id")
    // a cap too small to converge must throw, never return wrong labels
    intercept[IllegalStateException](Dedup.connectedComponents(chain, maxIter = 2))
  }

  test("deduplicateCorpus keeps one doc per near-dup component plus singletons") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then runs far away " +
      "into the deep dark forest where nobody ever goes at night"
    val docs = Seq(
      (1L, base), (2L, base.replace("lazy", "sleepy")), (3L, base + " more"),
      (9L, "a totally unrelated document about catalyst optimizer internals " +
        "and adaptive query execution behavior under skew"))
      .toDF("doc_id", "text")
    val kept = Dedup.deduplicateCorpus(docs, threshold = 0.4)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 9L)) // 2 and 3 fold into 1's component
    // no pairs above an impossible threshold → the whole corpus is kept
    assert(Dedup.deduplicateCorpus(docs, threshold = 1.1).count() === 4)
    // the flagged frame carries EVERY doc, so kept/total stats need one
    // aggregation over one dataflow (no second corpus count — VERDICT r9 #5)
    val flags = Dedup.corpusDedupFlags(docs, threshold = 0.4)
    assert(flags.count() === 4)
    val stats = flags.agg(
      org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("kept"), 1L).otherwise(0L)).as("n_kept"),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_docs")).collect()(0)
    assert(stats.getLong(0) === 2L && stats.getLong(1) === 4L)
  }

  test("similarity handles zero vectors without exceptions") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0f, 0f, 0f, 0f), 0),
      (2L, Array(1f, 2f, 3f, 4f), 0),
      (3L, Array(1f, 2f, 3f, 4f), 1)).toDF("vec_id", "embedding", "label")
    val pairs = Similarity.embeddingNearDups(vecs, threshold = 0.5).collect()
    // zero-vector cosine is NaN → excluded by the threshold filter, and the
    // identical pair (2,3) survives at sim 1.0
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((2L, 3L)))
    assert(pairs.head.getDouble(2) === 1.0)
  }
}
