package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class ChunkingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("chunks cover every token with the declared overlap") {
    import spark.implicits._
    val doc = Seq((1L, (1 to 150).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunking.chunkDocuments(doc, chunkTokens = 64, overlap = 16)
      .orderBy("chunk_idx").collect()
    // 150 tokens, stride 48 → ceil((150-16)/48) = 3 chunks
    assert(chunks.length === 3)
    assert(chunks.map(_.getInt(3)).toSeq === Seq(64, 64, 54))
    // consecutive chunks share exactly the overlap
    val t0 = chunks(0).getString(2).split(" ")
    val t1 = chunks(1).getString(2).split(" ")
    assert(t0.takeRight(16).toSeq === t1.take(16).toSeq)
    // a doc shorter than one chunk yields exactly one chunk
    val short = Chunking.chunkDocuments(
      Seq((2L, "only three words")).toDF("doc_id", "text")).collect()
    assert(short.length === 1 && short(0).getInt(3) === 3)
    intercept[IllegalArgumentException](
      Chunking.chunkDocuments(doc, chunkTokens = 16, overlap = 16))
  }

  test("exact packing never exceeds the budget and loses no tokens") {
    val chunks = Chunking.chunkDocuments(Tables.documents(spark, sf))
    val packed = Chunking.packChunksExact(chunks, budget = 256)
    val packs = packed.groupBy("shard", "pack_seq").agg(sum("n_tokens").as("t")).collect()
    assert(packs.forall(_.getLong(2) <= 256), "a pack exceeded the budget")
    assert(packed.count() === chunks.count())
    assert(packed.agg(sum("n_tokens")).collect()(0).getLong(0) ===
      chunks.agg(sum("n_tokens")).collect()(0).getLong(0))
  }

  test("packing is bounded by budget + chunk size - 1 and loses no tokens") {
    val chunks = Chunking.chunkDocuments(Tables.documents(spark, sf))
    val packed = Chunking.packChunks(chunks, budget = 256)
    val packs = packed.groupBy("shard", "pack_seq").agg(sum("n_tokens").as("t")).collect()
    assert(packs.forall(_.getLong(2) <= 256 + 64 - 1))
    assert(packed.agg(sum("n_tokens")).collect()(0).getLong(0) ===
      chunks.agg(sum("n_tokens")).collect()(0).getLong(0))
  }

  test("packing shards its window — no single-partition global sort in the plan") {
    val chunks = Chunking.chunkDocuments(Tables.documents(spark, sf))
    val plan = Chunking.packChunks(chunks, budget = 256)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"packChunks planned a single-partition window:\n$plan")
  }
}
