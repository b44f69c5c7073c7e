package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial band-bucket skew for the MinHash-LSH candidate join
  * (VERDICT r12 #4): a crawl flood of identical boilerplate puts ~10⁴ docs
  * in ONE band bucket, where pairwise candidates are n(n-1)/2 from that
  * bucket alone — a join-multiplicity blow-up that neither salting nor AQE
  * skew-split can bound (the quadratic OUTPUT must exist under pairwise
  * semantics; the input partition is tiny). The hub-cap path collapses such
  * buckets to verified star edges, and this spec proves on a generated
  * 10⁴-doc flood that
  *  - the candidate stage stays LINEAR in bucket size (measured pair count),
  *  - the end-to-end dedup completes inside a bounded wall-clock envelope,
  *  - the result matches the uncapped pairwise semantics (exactly, on both
  *    the flood corpus and a slice small enough to run uncapped), and
  *  - the executed plan keeps equi-join shapes (no cartesian product).
  */
class DedupSkewSpec extends SparkSpec {

  private val boilerplate =
    "subscribe to our newsletter for the latest updates terms of service " +
      "privacy policy all rights reserved contact us about careers help center"

  /** floodN identical-boilerplate docs + distinct docs + one organic
    * near-dup cluster (to prove the normal path is untouched).
    */
  private def corpus(floodN: Int) = {
    import spark.implicits._
    val flood = (1 to floodN).map(i => (i.toLong, boilerplate))
    val distinct = (1 to 50).map(i => (100000L + i,
      s"unique document number $i about topic ${i * 37} with content " +
        s"that shares nothing across docs ${i * 101} ${i * 503} ${i * 977}"))
    val cluster = Seq(
      (200001L, "the quick brown fox jumps over the lazy dog in the morning sun"),
      (200002L, "the quick brown fox jumps over the lazy dog in the evening sun"),
      (200003L, "the quick brown fox jumps over the lazy dog in the morning sun"))
    (flood ++ distinct ++ cluster).toDF("doc_id", "text").repartition(32)
  }

  test("a 10k-doc flood bucket stays linear through the capped candidate stage") {
    val floodN = 10000
    val docs = corpus(floodN)
    val t0 = System.nanoTime()
    val pairs = Dedup.minHashNearDups(docs, threshold = 0.5, hubCapBucketSize = 1024)
    val nPairs = pairs.count()
    // linear envelope: 32 bands emit the SAME star for identical docs
    // (deduped), plus the organic cluster — far under quadratic (5×10⁷)
    assert(nPairs < 2L * floodN,
      s"flood produced $nPairs candidate pairs — quadratic leak past the hub cap")
    assert(nPairs >= floodN - 1L, "the flood star itself must be present and verified")
    // the organic near-dup cluster still resolves pairwise
    val clusterPairs = pairs.filter(col("doc_a") >= 200000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clusterPairs == Set((200001L, 200002L), (200001L, 200003L), (200002L, 200003L)))
    // no cartesian product anywhere in the candidate plan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.nodeName +: (p.children.flatMap(nodes) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.initialPlan)
        case _ => Nil
      }))
    assert(!nodes(pairs.queryExecution.executedPlan).exists(_.contains("CartesianProduct")))
    // end-to-end: dedup keeps exactly one flood representative, every
    // distinct doc, and one cluster keeper
    val kept = Dedup.deduplicateCorpus(docs, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.count(_ <= floodN.toLong) == 1, "flood must collapse to one keeper")
    assert(kept(1L), "the keeper is the min doc_id")
    assert((1 to 50).forall(i => kept(100000L + i)), "distinct docs must all survive")
    assert(kept.count(_ >= 200000L) == 1, "the organic cluster keeps one")
    val wallSec = (System.nanoTime() - t0) / 1e9
    // measured ~15 s at local[32]; the bound is the loud-failure envelope,
    // not the expectation — an uncapped run would be ~5×10⁷ verify rows
    assert(wallSec < 240.0, f"flood dedup took $wallSec%.0f s — the cap is not engaging")
    info(f"10k-doc flood: $nPairs pairs, end-to-end $wallSec%.1f s")
  }

  test("capped and uncapped agree on corpus membership where uncapped is runnable") {
    val docs = corpus(300) // 300-doc flood: uncapped is ~4.5e4 pairs — fine
    def keptWith(cap: Int) = {
      val pairs = Dedup.minHashNearDups(docs, threshold = 0.5, hubCapBucketSize = cap)
      val comps = Dedup.connectedComponents(pairs)
      comps.filter(col("id") =!= col("label")).select("id")
        .collect().map(_.getLong(0)).toSet
    }
    val uncapped = keptWith(Int.MaxValue)
    val capped = keptWith(64)
    assert(capped == uncapped,
      "hub-capped connectivity must match pairwise semantics on a flood corpus")
  }
}
