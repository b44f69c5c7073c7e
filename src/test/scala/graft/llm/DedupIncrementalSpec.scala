package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Independent checks for the incremental-ingestion dedup family
  * (`dedup_incremental` is declared-unverifiable in DuckDB — xxhash-keyed
  * LSH like the rest of the minhash entries — so its semantics are proven
  * in-Spark instead):
  *
  *  1. PARITY: the incremental probe (batch band rows joined against the
  *     persisted corpus index) must produce EXACTLY the cross pairs the
  *     whole-corpus self-join (`minHashNearDups` over corpus ∪ batch)
  *     produces — signatures are pure functions of text, so the two
  *     formulations are mathematically the same set reached through
  *     different plans. Any drift in index construction, probe join, or
  *     verification shows here.
  *  2. REPLAY: the admission flags equal a driver-side union-find +
  *     rejection replay over the same pair sets (shares no code with
  *     `connectedComponents`/`ingestFlags`' joins).
  *  3. COMPOSABILITY: an index built from corpus halves unioned equals the
  *     whole-corpus index — the property that makes append-only index
  *     maintenance sound.
  */
class DedupIncrementalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val threshold = 0.3

  test("incremental probe equals the whole-corpus self-join restricted to cross pairs") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)

    val index = Dedup.minHashBandRows(corpus)
    val incremental = Dedup.incrementalNearDups(batch, index, corpus, threshold = threshold)
      .select("corpus_doc_id", "new_doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val whole = Dedup.minHashNearDups(docs, threshold = threshold)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        (a % 5, b % 5) match {
          case (4, 4) => None               // within-batch
          case (_, 4) => Some((a, b))       // corpus → batch
          case (4, _) => Some((b, a))       // batch → corpus (reorder)
          case _ => None                    // within-corpus
        }
      }.toSet

    assert(incremental.nonEmpty, "sf0.01 must contain cross-split near-dup pairs")
    assert(incremental === whole,
      s"probe/self-join pair sets differ: only-incremental=" +
        s"${(incremental -- whole).take(5)} only-whole=${(whole -- incremental).take(5)}")
  }

  test("admission flags equal a driver-side replay; entry aggregates match") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    val index = Dedup.minHashBandRows(corpus)

    val cross = Dedup.incrementalNearDups(batch, index, corpus, threshold = threshold)
    val within = Dedup.minHashNearDups(batch, threshold = threshold)

    val crossPairs = cross.select("new_doc_id").collect().map(_.getLong(0)).toSet
    val withinPairs = within.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0))

    // independent union-find over within-batch pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    withinPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = batchIds.map(id => id -> find(id)).toMap
    val compDup = comp.groupBy(_._2).map { case (c, m) =>
      c -> m.keys.exists(crossPairs.contains)
    }
    val rep = comp.groupBy(_._2).map { case (c, m) => c -> m.keys.min }
    val expected = batchIds.map { id =>
      id -> ((crossPairs.contains(id), comp(id),
        !compDup(comp(id)) && rep(comp(id)) == id))
    }.toMap

    val actual = Dedup.ingestFlags(batch, cross, within)
      .select("doc_id", "corpus_dup", "component", "kept").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(actual === expected)

    // the sweep entry's aggregates recomputed from the replay side
    val keptIds = expected.filter(_._2._3).keys
    val row = Dedup.queries("dedup_incremental")(spark, sf).collect().head
    assert(row.getLong(row.fieldIndex("n_batch")) === batchIds.length.toLong)
    assert(row.getLong(row.fieldIndex("n_kept")) === keptIds.size.toLong)
    assert(row.getLong(row.fieldIndex("kept_id_sum")) === keptIds.sum)
    assert(row.getLong(row.fieldIndex("n_corpus_dups")) === crossPairs.size.toLong)
  }

  test("band index composes under union (append-only maintenance is sound)") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val whole = Dedup.minHashBandRows(corpus)
    val halves = Dedup.minHashBandRows(corpus.filter(col("doc_id") < 250))
      .union(Dedup.minHashBandRows(corpus.filter(col("doc_id") >= 250)))
    assert(whole.exceptAll(halves).isEmpty && halves.exceptAll(whole).isEmpty)
  }

  test("the probe plan is an equi-join — no cartesian product anywhere") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    val plan = Dedup.incrementalNearDups(batch,
      Dedup.minHashBandRows(corpus), corpus, threshold = threshold)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"incremental probe plan contains a cartesian product:\n$plan")
  }
}
