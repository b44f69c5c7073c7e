package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.queries.Tables

/** BM25 keyword retrieval over the `documents` table (Robertson/Spärck Jones;
  * the Lucene-default `k1=1.2, b=0.75` variant with the `ln(1 + (N-df+0.5)/
  * (df+0.5))` idf).
  *
  * Scale design: corpus statistics (N, avgdl, per-term df) reduce to ONE
  * aggregated row that is broadcast back onto the corpus — scoring is then a
  * map-only projection per document (per-term tf via an array filter over the
  * doc's own words, no explode, no shuffle). At 100 TB this is a single scan
  * plus a scalar broadcast; the only caveat is that the query-term set is
  * compile-time fixed per run, which is exactly the batch-retrieval shape.
  *
  * Float parity with the DuckDB oracle: term contributions are added in the
  * FIXED order of `terms` (a left fold, never an aggregate whose addend order
  * the engine picks), all arithmetic is DOUBLE, and the score is rounded to 5
  * decimals at the end.
  */
object Retrieval {
  type Q = (SparkSession, String) => DataFrame

  val K1 = 1.2
  val B = 0.75

  /** The fixed query of the checked entries — three mid-frequency corpus
    * terms, so idf spreads and ranking is non-degenerate.
    */
  val QueryTerms: Seq[String] = Seq("table", "merge", "vector")

  private def words(text: Column): Column =
    filter(split(lower(trim(coalesce(text, lit("")))), "\\s+"), w => w =!= "")

  /** Per-document BM25 scores for `terms`: (doc_id, dl, tf_<term>..., score).
    * One corpus-stats aggregation (single row, broadcast) + one map-only
    * scoring pass.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = K1, b: Double = B)
      : DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "query terms must be distinct")
    // per-term token scans are the map cost; spread is safe here — dl and
    // the tf/df columns are integer-valued doubles, so their sums are exact
    // regardless of partition fold order
    val withTf = graft.queries.Tables.spread(docs).select(
      col("doc_id") +: size(words(col("text"))).cast("double").as("dl") +:
        terms.map(t => size(filter(words(col("text")), w => w === lit(t)))
          .cast("double").as(s"tf_$t")): _*)
    val stats = withTf.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1.0).otherwise(0.0)).as(s"df_$t")): _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.map { t =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
      val tf = col(s"tf_$t")
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    }.reduceLeft(_ + _)
    scored.select(
      col("doc_id") +: col("dl").cast("bigint").as("dl") +:
        terms.map(t => col(s"tf_$t").cast("bigint").as(s"tf_$t")) :+
        round(score, 5).as("bm25"): _*)
  }

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al., SIGIR'09 —
    * the standard `1/(60+rank)` variant) of the BM25 keyword ranking and an
    * embedding-cosine ranking against the query vector `queryVecId`.
    *
    * Scale design: each branch reduces to its top-`poolK` with
    * `orderBy(...).limit(poolK)` — Spark plans that as TakeOrdered (per-
    * partition partial top-k merged on one reducer), NEVER a global sort,
    * so both rankings stay scan-shaped at 100 TB. Rank assignment and the
    * fusion join then run over ≤ 2·poolK rows (the single-partition window
    * is over that tiny pool by contract, not the corpus). Docs missing
    * from one branch's pool contribute only the other branch's RRF term —
    * the standard union semantics.
    *
    * Cross-engine determinism: BM25 ranks order by the 5-decimal-rounded
    * score then doc_id; cosine ranks order by the raw double sim (the fold
    * is bit-identical to DuckDB's `list_cosine_similarity`, proven by the
    * `emb_cosine_topk` oracle) then doc_id; the RRF score is a fixed-order
    * two-term sum of exact rationals, rounded to 6 at the end.
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      queryVecId: Long = 0L, poolK: Int = 20, k: Int = 10,
      rrfK: Int = 60): DataFrame = {
    val bmPool = bm25(docs, terms)
      .filter(col("bm25") > 0) // retrieval lists only docs matching >= 1 term
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(poolK)
      .withColumn("bm25_rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("bm25_rank"))
    val qv = emb.filter(col("vec_id") === queryVecId).select(col("embedding").as("qe"))
    val cosPool = emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        Similarity.cosine(col("qe"), col("embedding")).as("sim"))
      .filter(!isnan(col("sim"))) // zero vectors must not rank first
      .orderBy(col("sim").desc, col("doc_id").asc).limit(poolK)
      .withColumn("cos_rank",
        row_number().over(Window.orderBy(col("sim").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("cos_rank"))
    bmPool.join(cosPool, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        // rrf from the NULLABLE ranks (1/(k+null) -> null -> 0), then the
        // report columns coalesce absent ranks to 0
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("bm25_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK) + col("cos_rank")), lit(0.0)),
          6).as("rrf"),
        coalesce(col("bm25_rank"), lit(0)).cast("bigint").as("bm25_rank"),
        coalesce(col("cos_rank"), lit(0)).cast("bigint").as("cos_rank"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("bm25_rank"), col("cos_rank"), col("rrf"))
  }

  val queries: Map[String, Q] = Map(
    // Per-doc BM25 score report for the fixed query (hash-checked vs DuckDB)
    "retrieval_bm25" -> ((s, dir) =>
      bm25(Tables.documents(s, dir), QueryTerms).orderBy("doc_id")),

    // Top-10 by score: ranking parity, ties broken by doc_id
    "retrieval_bm25_topk" -> ((s, dir) =>
      bm25(Tables.documents(s, dir), QueryTerms)
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(10)),

    // Hybrid keyword+vector retrieval fused by RRF (DuckDB-checked end to
    // end: ranks, fusion scores, and the final top-10)
    "retrieval_hybrid_rrf" -> ((s, dir) =>
      hybridRrf(Tables.documents(s, dir), Tables.embeddings(s, dir), QueryTerms))
  )

  // DuckDB twin: identical tokenization (string_split_regex + filter),
  // identical stats (one aggregated row cross-joined back), identical
  // fixed-order sum of per-term contributions, round(..., 5) last.
  private def tfSql(t: String) =
    s"len(list_filter(w, x -> x = '$t'))"

  private val scoredCte =
    raw"""WITH wl AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> x <> '') AS w
           FROM documents),
         tf AS (
           SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
                  CAST(${tfSql("table")} AS DOUBLE) AS tf_table,
                  CAST(${tfSql("merge")} AS DOUBLE) AS tf_merge,
                  CAST(${tfSql("vector")} AS DOUBLE) AS tf_vector
           FROM wl),
         stats AS (
           SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                  SUM(dl) / COUNT(*) AS avgdl,
                  SUM(CASE WHEN tf_table > 0 THEN 1.0 ELSE 0.0 END) AS df_table,
                  SUM(CASE WHEN tf_merge > 0 THEN 1.0 ELSE 0.0 END) AS df_merge,
                  SUM(CASE WHEN tf_vector > 0 THEN 1.0 ELSE 0.0 END) AS df_vector
           FROM tf),
         scored AS (
           SELECT tf.doc_id, tf.dl, tf.tf_table, tf.tf_merge, tf.tf_vector,
             ((ln(1.0 + (n_docs - df_table + 0.5) / (df_table + 0.5))
                 * (tf_table * (1.2 + 1.0)) / (tf_table + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
              + (ln(1.0 + (n_docs - df_merge + 0.5) / (df_merge + 0.5))
                 * (tf_merge * (1.2 + 1.0)) / (tf_merge + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
              + (ln(1.0 + (n_docs - df_vector + 0.5) / (df_vector + 0.5))
                 * (tf_vector * (1.2 + 1.0)) / (tf_vector + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
             ) AS raw_score
           FROM tf CROSS JOIN stats)"""

  private val baseSql = scoredCte +
    raw"""
         SELECT doc_id, CAST(dl AS BIGINT) AS dl,
                CAST(tf_table AS BIGINT) AS tf_table,
                CAST(tf_merge AS BIGINT) AS tf_merge,
                CAST(tf_vector AS BIGINT) AS tf_vector,
                round(raw_score, 5) AS bm25
         FROM scored"""

  // The hybrid oracle replays both rankings and the fused top-10: BM25
  // from the shared scored CTE, cosine from list_cosine_similarity (the
  // same pairing the emb_cosine_topk oracle proves bit-identical), RRF as
  // the identical fixed-order sum over nullable ranks.
  private val hybridSql = scoredCte +
    raw""",
         bm AS (SELECT doc_id, round(raw_score, 5) AS bm25 FROM scored
                WHERE round(raw_score, 5) > 0
                ORDER BY bm25 DESC, doc_id LIMIT 20),
         bmr AS (SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rank
                 FROM bm),
         qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
                WHERE vec_id = 0),
         cp AS (SELECT e.vec_id AS doc_id,
                  list_cosine_similarity(qv.qe, CAST(e.embedding AS DOUBLE[])) AS sim
                FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
         cpool AS (SELECT doc_id, sim FROM cp WHERE NOT isnan(sim)
                   ORDER BY sim DESC, doc_id LIMIT 20),
         cr AS (SELECT doc_id,
                  row_number() OVER (ORDER BY sim DESC, doc_id) AS cos_rank
                FROM cpool),
         fused AS (
           SELECT COALESCE(bmr.doc_id, cr.doc_id) AS doc_id,
                  round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + bm25_rank), 0.0)
                      + COALESCE(CAST(1.0 AS DOUBLE) / (60 + cos_rank), 0.0), 6) AS rrf,
                  CAST(COALESCE(bm25_rank, 0) AS BIGINT) AS bm25_rank,
                  CAST(COALESCE(cos_rank, 0) AS BIGINT) AS cos_rank
           FROM bmr FULL OUTER JOIN cr ON bmr.doc_id = cr.doc_id)
         SELECT doc_id, bm25_rank, cos_rank, rrf
         FROM fused ORDER BY rrf DESC, doc_id LIMIT 10"""

  val oracle: Map[String, String] = Map(
    "retrieval_bm25" -> (baseSql + " ORDER BY doc_id"),
    "retrieval_bm25_topk" -> (baseSql + " ORDER BY bm25 DESC, doc_id ASC LIMIT 10"),
    "retrieval_hybrid_rrf" -> hybridSql
  )
}
