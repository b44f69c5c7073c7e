package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** PII scrubbing: pattern-redaction over document text (the privacy pass a
  * training pipeline runs before anything else sees the corpus). Map-only —
  * a chain of codegen'd regexp_replace calls, no shuffle, column-pruned to
  * the text column at the scan.
  *
  * The synthetic corpus contains no PII, so the checked entry SEEDS
  * deterministic fake PII (an email and a phone per doc, derived from
  * doc_id) with the same string expression in Spark and the DuckDB oracle,
  * then proves the redaction pass removes every occurrence. Patterns avoid
  * lookarounds/backrefs so Java regex (Spark) and RE2 (DuckDB) agree.
  */
object Scrub {
  type Q = (SparkSession, String) => DataFrame

  /** (pattern, replacement token) pairs applied in order. */
  val DefaultPatterns: Seq[(String, String)] = Seq(
    "[a-z0-9._]+@[a-z0-9.]+" -> "<EMAIL>",
    "\\+1-555-[0-9]{4}" -> "<PHONE>")

  /** `df` with `col` redacted through every pattern, in order. */
  def redact(text: Column, patterns: Seq[(String, String)] = DefaultPatterns): Column =
    patterns.foldLeft(text) { case (c, (re, token)) => regexp_replace(c, re, token) }

  /** Deterministic fake PII appended to each doc — the same expression the
    * oracle states in SQL, so both engines redact identical inputs.
    */
  private def seeded(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@ex.org or +1-555-"),
      lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
      lit(" now")).as("t"))

  val queries: Map[String, Q] = Map(
    // Redaction report: hash of the scrubbed text + per-pattern match counts
    "text_redact_pii" -> ((s, dir) => {
      val r = seeded(Tables.documents(s, dir))
        .withColumn("r", redact(col("t")))
      r.select(col("doc_id"),
          md5(col("r")).as("redacted_md5"),
          size(regexp_extract_all(col("t"), lit(DefaultPatterns.head._1), lit(0)))
            .cast("bigint").as("n_emails"),
          size(regexp_extract_all(col("t"), lit(DefaultPatterns(1)._1), lit(0)))
            .cast("bigint").as("n_phones"),
          (length(col("t")) - length(col("r"))).cast("bigint").as("n_chars_removed"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "text_redact_pii" ->
      raw"""WITH seeded AS (
           SELECT doc_id,
             text || ' contact user' || doc_id || '@ex.org or +1-555-' ||
               lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') || ' now' AS t
           FROM documents),
         red AS (
           SELECT doc_id, t,
             regexp_replace(
               regexp_replace(t, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
               '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS r
           FROM seeded)
         SELECT doc_id, md5(r) AS redacted_md5,
           CAST(len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
           CAST(length(t) - length(r) AS BIGINT) AS n_chars_removed
         FROM red ORDER BY doc_id"""
  )
}
