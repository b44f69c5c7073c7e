package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Document chunking and sequence packing — the steps between a cleaned
  * corpus and a training batch: split each document into fixed-size
  * (optionally overlapping) token windows, then pack chunks into
  * fixed-token-budget groups.
  *
  * Scale notes: chunking is a per-row explode (map-only, no shuffle; output
  * row count is input tokens / stride). Packing is deterministic per SHARD
  * (doc-id hash): each shard orders its chunks by (doc_id, chunk_idx) and
  * packs independently — shards are the unit of parallelism, so there is no
  * global sort anywhere and 100 TB packs as thousands of concurrent shard
  * windows.
  */
object Chunking {
  type Q = (SparkSession, String) => DataFrame

  /** Whitespace word array (the "tokens" of this environment — a real BPE
    * tokenizer would replace the split, not the plumbing).
    */
  private def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Explode documents into overlapping chunks of `chunkTokens` words with
    * `overlap` words shared between consecutive chunks.
    */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap < chunkTokens, "overlap must be smaller than the chunk size")
    val stride = chunkTokens - overlap
    val toks = tokens(col("text"))
    val nChunks = greatest(lit(1),
      ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"))
    docs
      .select(col("doc_id"), toks.as("toks"), nChunks.as("n_chunks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), col("n_chunks") - 1)).as(Seq("chunk_idx", "start0")))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), size(col("toks")) - col("chunk_idx") * stride)
          .as("n_tokens"))
  }

  /** Streaming sequential packing: within each shard (doc-id hash), chunks in
    * (doc_id, chunk_idx) order are assigned to packs via a cumulative-sum
    * window — deterministic, single pass, no state. A boundary-straddling
    * chunk joins the pack its END falls in, so a pack holds at most
    * `budget + chunkTokens - 1` tokens (mean ≈ budget); exact-capacity bin
    * packing needs the stateful reset `packChunksExact` implements.
    *
    * Sharding is the scale design, not an option: a no-partition window is a
    * single-partition global sort — one task owns the entire corpus. Packs
    * are identified by (shard, pack_seq); shards pack independently and in
    * parallel, which is exactly how a 100 TB corpus packs per source shard.
    */
  def packChunks(chunks: DataFrame, budget: Int = 256, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id", "chunk_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_seq", floor((col("cum_tokens") - 1) / budget).cast("bigint"))
  }

  /** Exact-capacity greedy packing: within each shard, chunks are visited in
    * (doc_id, chunk_idx) order and a pack closes when the next chunk would
    * exceed `budget` — every pack is strictly ≤ budget. This is the stateful
    * reset no window function expresses; shards (`n_shards`, by doc-id hash)
    * bound the per-group iteration and are the unit of parallelism at scale.
    * Pack ids are (shard, seq) so they're deterministic and collision-free.
    */
  def packChunksExact(chunks: DataFrame, budget: Int = 256, nShards: Int = 8): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"))
      .as[(Long, Int, Int, Long)]
      .groupByKey(_._4)
      .flatMapGroups { (shard, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._1, r._2))
        val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Long)]()
        var packSeq = 0L
        var used = 0
        sorted.foreach { case (docId, chunkIdx, nTokens, _) =>
          if (used > 0 && used + nTokens > budget) { packSeq += 1; used = 0 }
          used += nTokens
          out += ((docId, chunkIdx, shard, packSeq))
        }
        out.iterator
      }
      .toDF("doc_id", "chunk_idx", "shard", "pack_seq")
      .join(chunks, Seq("doc_id", "chunk_idx"))
  }

  val queries: Map[String, Q] = Map(
    // Exact-capacity packing — strict budget, recursive-CTE oracle
    "chunk_packing_exact" -> ((s, dir) => {
      val packed = packChunksExact(chunkDocuments(Tables.documents(s, dir)))
      packed.groupBy("shard", "pack_seq")
        .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("pack_tokens"))
        .agg(count(lit(1)).as("n_packs"),
          max(col("pack_tokens")).as("max_pack_tokens"),
          sum(col("pack_tokens")).as("total_tokens"))
    }),

    // Chunk inventory: per-doc chunk counts and token coverage
    "chunk_documents" -> ((s, dir) =>
      chunkDocuments(Tables.documents(s, dir))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).as("chunked_tokens"),
          max(col("n_tokens")).as("max_chunk_tokens"))
        .orderBy("doc_id")),

    // Packing contract: per-shard packs bounded by budget + chunk size - 1
    "chunk_packing" -> ((s, dir) => {
      val packed = packChunks(chunkDocuments(Tables.documents(s, dir)))
      packed.groupBy("shard", "pack_seq")
        .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("pack_tokens"))
        .orderBy("shard", "pack_seq")
    })
  )

  val oracle: Map[String, String] = Map(
    "chunk_documents" ->
      raw"""WITH t AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
         n AS (
           SELECT doc_id, len(toks) AS n_tok,
                  GREATEST(1, CAST(CEIL((len(toks) - 16) / 48.0) AS INT)) AS n_chunks
           FROM t),
         c AS (
           SELECT doc_id, n_tok, UNNEST(range(0, n_chunks)) AS i FROM n)
         SELECT doc_id, COUNT(*) AS n_chunks,
                CAST(SUM(LEAST(64, n_tok - i * 48)) AS BIGINT) AS chunked_tokens,
                CAST(MAX(LEAST(64, n_tok - i * 48)) AS INT) AS max_chunk_tokens
         FROM c GROUP BY doc_id ORDER BY doc_id""",
    "chunk_packing" ->
      raw"""WITH t AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
         n AS (
           SELECT doc_id, len(toks) AS n_tok,
                  GREATEST(1, CAST(CEIL((len(toks) - 16) / 48.0) AS INT)) AS n_chunks
           FROM t),
         c AS (
           SELECT doc_id, n_tok, UNNEST(range(0, n_chunks)) AS i FROM n),
         chunks AS (
           SELECT doc_id, i AS chunk_idx, LEAST(64, n_tok - i * 48) AS n_tokens,
                  doc_id % 8 AS shard FROM c),
         cum AS (
           SELECT shard, doc_id, chunk_idx, n_tokens,
                  SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
           FROM chunks)
         SELECT CAST(shard AS BIGINT) AS shard,
                CAST(FLOOR((cum_tokens - 1) / 256) AS BIGINT) AS pack_seq,
                COUNT(*) AS n_chunks, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
         FROM cum GROUP BY 1, 2 ORDER BY shard, pack_seq""",
    // The stateful greedy reset (close a pack when the next chunk would
    // exceed the budget) is no window function, but it IS a linear
    // recurrence — a recursive CTE threads (used, pack_seq) through each
    // shard's row chain, so DuckDB replays the exact sequential semantics
    // the flatMapGroups implementation runs. Recursion depth = the longest
    // shard's chunk count (bounded at the oracle's sf).
    "chunk_packing_exact" ->
      raw"""WITH RECURSIVE t AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
         n AS (
           SELECT doc_id, len(toks) AS n_tok,
                  GREATEST(1, CAST(CEIL((len(toks) - 16) / 48.0) AS INT)) AS n_chunks
           FROM t),
         c AS (
           SELECT doc_id, n_tok, UNNEST(range(0, n_chunks)) AS i FROM n),
         ch AS (
           SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                  CAST(LEAST(64, n_tok - i * 48) AS INT) AS n_tokens,
                  doc_id % 8 AS shard FROM c),
         seq AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY shard
                       ORDER BY doc_id, chunk_idx) AS rn
           FROM ch),
         rec AS (
           SELECT shard, rn, n_tokens, n_tokens AS used, CAST(0 AS BIGINT) AS pack_seq
           FROM seq WHERE rn = 1
           UNION ALL
           SELECT s.shard, s.rn, s.n_tokens,
                  CASE WHEN r.used > 0 AND r.used + s.n_tokens > 256
                       THEN s.n_tokens ELSE r.used + s.n_tokens END,
                  CASE WHEN r.used > 0 AND r.used + s.n_tokens > 256
                       THEN r.pack_seq + 1 ELSE r.pack_seq END
           FROM rec r JOIN seq s ON s.shard = r.shard AND s.rn = r.rn + 1),
         packs AS (
           SELECT shard, pack_seq, SUM(n_tokens) AS pack_tokens
           FROM rec GROUP BY 1, 2)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_packs,
                CAST(MAX(pack_tokens) AS BIGINT) AS max_pack_tokens,
                CAST(SUM(pack_tokens) AS BIGINT) AS total_tokens
         FROM packs"""
  )
}
