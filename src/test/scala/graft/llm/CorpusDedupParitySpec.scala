package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Independent-formulation check for `dedup_corpus_near` (VERDICT r12 #7):
  * the entry is declared-unverifiable in DuckDB (its pair set derives from
  * Spark's xxhash64 seed handling), so its end-to-end numbers are proven
  * here by a SECOND in-Spark formulation instead — a driver-side
  * union-find over the same verified pair set, which shares no code with
  * the distributed pointer-jumping `connectedComponents` it cross-checks.
  * Any bug in the CC fixpoint (wrong labels, premature convergence, lost
  * edges) or in the kept-flag join shows up as a component or keeper-set
  * mismatch; the exact aggregates the sweep entry emits (n_kept,
  * kept_id_sum, n_docs) are recomputed from the union-find side and must
  * match verbatim.
  */
class CorpusDedupParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("corpus dedup equals a driver-side union-find over the same verified pairs") {
    val docs = Tables.documents(spark, sf)
    // the sweep entry's exact configuration (threshold 0.3, capped candidates)
    val pairs = Dedup.minHashNearDups(docs, threshold = 0.3, hubCapBucketSize = 1024)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.01 documents must contain near-dup pairs")

    // independent formulation: classic path-compressing union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-label wins
    }
    pairs.foreach { case (a, b) => union(a, b) }

    val allIds = docs.select("doc_id").collect().map(_.getLong(0))
    val expectedKept = allIds.filter(id => find(id) == id).toSet

    val flags = Dedup.corpusDedupFlags(docs, threshold = 0.3)
      .select("doc_id", "kept").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val actualKept = flags.filter(_._2).keySet

    assert(actualKept === expectedKept,
      s"keeper sets differ: only-cc=${(actualKept -- expectedKept).take(5)} " +
        s"only-uf=${(expectedKept -- actualKept).take(5)}")

    // and the sweep entry's emitted aggregates match the union-find numbers
    val row = Dedup.queries("dedup_corpus_near")(spark, sf).collect().head
    assert(row.getLong(row.fieldIndex("n_kept")) === expectedKept.size.toLong)
    assert(row.getLong(row.fieldIndex("kept_id_sum")) === expectedKept.sum)
    assert(row.getLong(row.fieldIndex("n_docs")) === allIds.length.toLong)
  }
}
