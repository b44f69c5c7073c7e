package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup
import graft.queries.Tables

/** The LSH+index scale path of `StreamOps.dedupIngestBatch` (the
  * oracle-checked `stream_incremental_ingest` entry runs the exactPairs
  * twin): two-table exactly-once, index maintenance, and the crash-repair
  * contract — a replay after a crash BETWEEN the corpus and index commits
  * must reconstruct exactly the admitted rows' band rows from the corpus
  * table's own commit.
  */
class StreamIncrementalIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val threshold = 0.3

  private def docs: DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text")

  private def mkTables(tag: String) = {
    val corpusT = graft.table.GraftTable.create(spark, scratchDir(s"$tag-corpus"),
      docs.schema)
    val indexT = graft.table.GraftTable.create(spark, scratchDir(s"$tag-index"),
      Dedup.minHashBandRows(docs.limit(1)).schema)
    (corpusT, indexT)
  }

  private val ranges = Seq((0L, 150L), (150L, 300L), (300L, 450L))
  private def batchOf(r: (Long, Long)): DataFrame =
    docs.filter(col("doc_id") >= r._1 && col("doc_id") < r._2)

  test("streamed LSH ingestion equals a fresh-index sequential replay; index tracks the corpus") {
    val (corpusT, indexT) = mkTables("incr-lsh")
    ranges.zipWithIndex.foreach { case (r, i) =>
      StreamOps.dedupIngestBatch(corpusT, Some(indexT),
        threshold = threshold)(batchOf(r), i.toLong)
    }
    val streamed = corpusT.readLatest().select("doc_id").collect()
      .map(_.getLong(0)).toSet

    // independent replay: no index table, no fences — each step rebuilds
    // the index from the current corpus (what incremental maintenance must
    // be equivalent to)
    var corpus = docs.limit(0)
    ranges.foreach { r =>
      val batch = batchOf(r)
      val flags = Dedup.incrementalIngestFlags(batch,
        Dedup.minHashBandRows(corpus), corpus, threshold = threshold)
      corpus = corpus.union(
        batch.join(flags.filter(col("kept")).select("doc_id"),
          Seq("doc_id"), "left_semi")).localCheckpoint(eager = true)
    }
    val replayed = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed === replayed,
      s"only-streamed=${(streamed -- replayed).take(5)} " +
        s"only-replayed=${(replayed -- streamed).take(5)}")

    // the maintained index IS the fresh index of the final corpus
    val maintained = indexT.readLatest()
    val fresh = Dedup.minHashBandRows(corpusT.readLatest())
    assert(maintained.exceptAll(fresh).isEmpty && fresh.exceptAll(maintained).isEmpty)

    // at-least-once replay of every batch id is a full no-op on both tables
    val (nc, ni) = (corpusT.snapshotsList.size, indexT.snapshotsList.size)
    ranges.zipWithIndex.foreach { case (r, i) =>
      StreamOps.dedupIngestBatch(corpusT, Some(indexT),
        threshold = threshold)(batchOf(r), i.toLong)
    }
    assert(corpusT.snapshotsList.size === nc && indexT.snapshotsList.size === ni)
  }

  test("an all-duplicates batch commits an empty append and the fence still advances") {
    val (corpusT, indexT) = mkTables("incr-empty")
    val batch = batchOf(ranges(0))
    StreamOps.dedupIngestBatch(corpusT, Some(indexT),
      threshold = threshold)(batch, 0L)
    val n = corpusT.readLatest().count()
    // the same docs arrive again under a NEW batch id: every doc is an
    // exact corpus duplicate, kept is empty — the fence must still record
    // the batch (else at-least-once delivery reprocesses it forever)
    StreamOps.dedupIngestBatch(corpusT, Some(indexT),
      threshold = threshold)(batch, 1L)
    assert(StreamOps.lastCommittedBatchId(corpusT) === Some(1L))
    assert(StreamOps.lastCommittedBatchId(indexT) === Some(1L))
    assert(corpusT.readLatest().count() === n)
    val maintained = indexT.readLatest()
    val fresh = Dedup.minHashBandRows(corpusT.readLatest())
    assert(maintained.exceptAll(fresh).isEmpty && fresh.exceptAll(maintained).isEmpty)
  }

  test("a crash between the corpus and index commits repairs on replay") {
    val (corpusT, indexT) = mkTables("incr-crash")
    StreamOps.dedupIngestBatch(corpusT, Some(indexT),
      threshold = threshold)(batchOf(ranges(0)), 0L)

    // simulate the crash window: batch 1's corpus commit landed, the index
    // commit did not (replicate what the sink's first half would have done)
    val batch1 = batchOf(ranges(1))
    val corpus = corpusT.readLatest()
    val flags = Dedup.incrementalIngestFlags(batch1,
      indexT.readLatest(), corpus, threshold = threshold)
    val kept = batch1.join(flags.filter(col("kept")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    corpusT.append(kept, extraSummary = Map("stream-batch-id" -> "1"))
    val corpusSnaps = corpusT.snapshotsList.size

    // the foreachBatch replay: corpus fence must skip, index must repair
    StreamOps.dedupIngestBatch(corpusT, Some(indexT),
      threshold = threshold)(batch1, 1L)
    assert(corpusT.snapshotsList.size === corpusSnaps, "corpus must not re-commit")
    assert(StreamOps.lastCommittedBatchId(indexT) === Some(1L))

    // repaired index rows are exactly the admitted rows' band rows
    val maintained = indexT.readLatest()
    val fresh = Dedup.minHashBandRows(corpusT.readLatest())
    assert(maintained.exceptAll(fresh).isEmpty && fresh.exceptAll(maintained).isEmpty)
  }
}
