package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Deterministic sampling for training-data curation. Sample membership is a
  * pure function of the row's content hash — no RNG seed or state — so a
  * re-run, a different partitioning, or a different engine selects the
  * IDENTICAL sample (that's also what makes it oracle-checkable in DuckDB).
  * The filter is map-only and codegen'd: at 100 TB it rides the scan with
  * zero shuffles.
  */
object Sampling {
  type Q = (SparkSession, String) => DataFrame

  /** Hash bucket 0-99 derived from the first 6 hex digits of md5(text):
    * uniform for non-degenerate corpora and bit-identical across engines.
    */
  private def bucket(text: Column): Column =
    conv(substring(md5(text.cast("binary")), 1, 6), 16, 10).cast("bigint") % 100

  /** Bernoulli sampling at `defaultPct`%, overridden per stratum — the
    * "cap dominant languages, keep the tail" shape of corpus curation.
    */
  def stratifiedSample(docs: DataFrame, strataCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct): Column) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(bucket(col("text")) < pct)
  }

  val queries: Map[String, Q] = Map(
    // Stratified deterministic sample: halve English, keep 10% Chinese,
    // 25% everything else; per-stratum counts + id checksum
    "sample_stratified" -> ((s, dir) =>
      stratifiedSample(Tables.documents(s, dir), "lang",
        Map("en" -> 50, "zh" -> 10), defaultPct = 25)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
        .orderBy("lang"))
  )

  val oracle: Map[String, String] = Map(
    "sample_stratified" ->
      """SELECT lang, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
         FROM documents
         WHERE CAST(('0x' || substr(md5(text), 1, 6)) AS BIGINT) % 100 <
               CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 10 ELSE 25 END
         GROUP BY lang ORDER BY lang"""
  )
}
