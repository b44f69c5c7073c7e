package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    val withTf = docs.select(
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

  val queries: Map[String, Q] = Map(
    // Per-doc BM25 score report for the fixed query (hash-checked vs DuckDB)
    "retrieval_bm25" -> ((s, dir) =>
      bm25(Tables.documents(s, dir), QueryTerms).orderBy("doc_id")),

    // Top-10 by score: ranking parity, ties broken by doc_id
    "retrieval_bm25_topk" -> ((s, dir) =>
      bm25(Tables.documents(s, dir), QueryTerms)
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(10))
  )

  // DuckDB twin: identical tokenization (string_split_regex + filter),
  // identical stats (one aggregated row cross-joined back), identical
  // fixed-order sum of per-term contributions, round(..., 5) last.
  private def tfSql(t: String) =
    s"len(list_filter(w, x -> x = '$t'))"

  private val baseSql =
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
           FROM tf CROSS JOIN stats)
         SELECT doc_id, CAST(dl AS BIGINT) AS dl,
                CAST(tf_table AS BIGINT) AS tf_table,
                CAST(tf_merge AS BIGINT) AS tf_merge,
                CAST(tf_vector AS BIGINT) AS tf_vector,
                round(raw_score, 5) AS bm25
         FROM scored"""

  val oracle: Map[String, String] = Map(
    "retrieval_bm25" -> (baseSql + " ORDER BY doc_id"),
    "retrieval_bm25_topk" -> (baseSql + " ORDER BY bm25 DESC, doc_id ASC LIMIT 10")
  )
}
