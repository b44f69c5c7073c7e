package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** The corpus-preparation pipeline as ONE composed dataflow — the flagship
  * "what this engine is for" chain: exact dedup → quality filter →
  * temperature-weighted language mixing → per-language token accounting.
  * Every stage is individually oracle-checked elsewhere; this entry checks
  * their COMPOSITION (dedup feeds the filter, the filter's survivors drive
  * the data-dependent mix rates, the mix drives the final stats), which is
  * where integration bugs live.
  *
  * Scale shape: dedup is one hash shuffle on md5(text); the filter and mix
  * are map-only codegen'd expressions; the mix's per-source counts are one
  * map-side-combined agg. Nothing else shuffles until the final rollup.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup (keep lowest doc_id per identical text), default-threshold
    * quality filter, alpha=0.5 temperature mix over `lang`.
    */
  def prepareCorpus(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    val deduped = docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val filtered = TextAnalysis.qualityFilter(deduped)
      .filter(col("quality_pass"))
      .select(docs.columns.map(col).toSeq: _*)
    Sampling.temperatureMix(filtered, "lang", alpha = 0.5)
  }

  val queries: Map[String, Q] = Map(
    "pipeline_corpus_prep" -> ((s, dir) =>
      prepareCorpus(Tables.documents(s, dir))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("lang"))
  )

  val oracle: Map[String, String] = Map(
    "pipeline_corpus_prep" ->
      raw"""WITH dedup AS (
           SELECT * FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             FROM documents) WHERE rn = 1),
         q AS (
           SELECT *,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_words,
                  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                    / GREATEST(len(string_split_regex(trim(text), '\s+')), 1) AS mwl,
                  CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
                    / GREATEST(length(text), 1) AS sr
           FROM dedup),
         kept AS (
           SELECT doc_id, lang, text FROM q
           WHERE n_words >= 10 AND n_words <= 100000
             AND mwl >= 2.0 AND mwl <= 12.0 AND sr <= 0.1),
         c AS (SELECT lang, COUNT(*) AS n FROM kept GROUP BY lang),
         m AS (SELECT MIN(n) AS nmin FROM c),
         r AS (SELECT lang, CAST(FLOOR(SQRT(CAST(nmin AS DOUBLE) / n) * 1000000) AS BIGINT) AS thr
               FROM c, m)
         SELECT k.lang, COUNT(*) AS n_docs,
                CAST(SUM(len(string_split_regex(trim(k.text), '\s+'))) AS BIGINT) AS n_tokens,
                CAST(SUM(k.doc_id) AS BIGINT) AS id_sum
         FROM kept k JOIN r ON k.lang = r.lang
         WHERE CAST(('0x' || substr(md5(k.text), 1, 6)) AS BIGINT) % 1000000 < r.thr
         GROUP BY k.lang ORDER BY k.lang"""
  )
}
