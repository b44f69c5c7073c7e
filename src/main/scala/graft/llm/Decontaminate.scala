package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Benchmark decontamination: flag training documents that share word n-grams
  * with a held-out benchmark/eval set (the GPT-3 appendix-C design — there
  * with 13-grams; the synthetic `documents` corpus is ~54 words/doc from a
  * tiny vocabulary, so the checked entries use n=5 to get a non-degenerate
  * split).
  *
  * Scale design (100 TB corpus, benchmark sets are MBs):
  *  - the benchmark n-gram set is aggregated once and BROADCAST — the corpus
  *    side is a map-only pass over each doc's n-grams plus one partial-agg
  *    shuffle on doc_id, never a corpus×corpus join;
  *  - overlap counting is per-doc and associative (map-side combine);
  *  - the oracle-checked entries join on n-gram STRINGS so DuckDB can build
  *    the identical set; at real scale you would join on `ngram_hash` of the
  *    token hashes instead (same plan shape, 8 bytes per gram instead of a
  *    string — the hashed variant ships as `contaminationReport(hashGrams =
  *    true)` and is covered by a determinism spec).
  */
object Decontaminate {
  type Q = (SparkSession, String) => DataFrame

  /** Lower-cased whitespace word array (DuckDB twin: string_split_regex). */
  private def words(text: Column): Column =
    filter(split(lower(trim(coalesce(text, lit("")))), "\\s+"), w => w =!= "")

  /** Word n-grams of `text` as strings, via the native `ngram_strings`
    * expression (full windows only — short docs produce an empty array; the
    * composable transform/sequence/slice formulation ran its lambdas
    * interpreted and dominated the decontamination entries' runtime).
    */
  def wordNgrams(text: Column, n: Int): Column =
    call_function("ngram_strings", words(text), lit(n))

  /** Distinct n-grams hashed to longs — the at-scale form of the join key
    * (8 bytes/gram): xxhash64 of each native-built gram string. Both steps
    * are codegen'd single-pass expressions, and `ngram_strings`' full-window
    * semantics (short doc → empty) keep the hashed and string paths
    * row-for-row identical with no CaseWhen guard (a guard re-evaluates the
    * regex tokenization per branch — it benched 3× the whole string path).
    */
  def hashedNgrams(text: Column, n: Int): Column =
    array_distinct(call_function("xxhash64_array",
      call_function("ngram_strings", words(text), lit(n))))

  /** Per-document contamination report of `corpus` against `benchmark`:
    * (doc_id, n_grams, n_contaminated, contaminated) where `n_grams` is the
    * doc's distinct n-gram count and `n_contaminated` how many of those
    * appear anywhere in the benchmark set. Docs shorter than `n` words have
    * zero grams and are clean by definition.
    *
    * The benchmark gram set is distinct-aggregated and broadcast; Spark plans
    * the probe as a broadcast left-semi-style join under the corpus-side
    * explode, so the corpus is read exactly once, map-only before the final
    * doc_id partial agg.
    */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame, n: Int,
      hashGrams: Boolean = false): DataFrame = {
    // both join sides use the same gram form, so the hashed variant joins on
    // raw bigints (8-byte keys — the point of the scale path); the gram
    // column never reaches the report schema
    def grams(c: Column): Column =
      if (hashGrams) hashedNgrams(c, n)
      else array_distinct(wordNgrams(c, n))
    val benchGrams = benchmark
      .select(explode(grams(col("text"))).as("gram")).distinct()
      .withColumn("_hit", lit(1))
    Tables.spread(corpus)
      .select(col("doc_id"), explode_outer(grams(col("text"))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(
        count(col("gram")).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0))).cast("bigint").as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** Deterministic benchmark split of the synthetic corpus: every 17th doc
    * plays the eval set, the rest are the training corpus.
    */
  private def corpusBenchSplit(docs: DataFrame): (DataFrame, DataFrame) =
    (docs.filter(col("doc_id") % 17 =!= 0), docs.filter(col("doc_id") % 17 === 0))

  /** Corpus novelty scoring (the duplication-analysis lens of Lee et al.
    * 2022, arXiv:2107.06499: how much of each document is text the corpus
    * has already seen): per doc, the fraction of its distinct word n-grams
    * whose FIRST owner (minimum doc_id corpus-wide) is this doc. Low
    * novelty marks boilerplate and near-copies without committing to a
    * dedup decision — the analysis that motivates one.
    *
    * Scale shape: the exploded distinct-gram stream is shuffled exactly
    * once (the gram → min doc_id aggregation, narrow rows, map-side
    * combined) and never joined back. Everything after runs on the owners
    * table — distinct-gram-sized, strictly smaller — whose per-first_doc
    * count is the n_novel column; `n_grams` is a map-only
    * `size(array_distinct(...))` per doc, and the two meet in a
    * doc_id-keyed join of doc-sized sides. At 100 TB the gram key is the
    * 8-byte `ngram_hash` (the decontamination precedent); string grams
    * keep this entry oracle-checkable.
    */
  def noveltyReport(corpus0: DataFrame, n: Int = 5): DataFrame = {
    val corpus = Tables.spread(corpus0)
    val g = corpus.select(col("doc_id"),
      explode(array_distinct(wordNgrams(col("text"), n))).as("gram"))
    val novel = g.groupBy("gram").agg(min("doc_id").as("first_doc"))
      .groupBy("first_doc").agg(count(lit(1)).as("n_novel"))
      .withColumnRenamed("first_doc", "doc_id")
    val perDoc = corpus.select(col("doc_id"),
      size(array_distinct(wordNgrams(col("text"), n))).cast("bigint").as("n_grams"))
    perDoc.join(novel, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(round(col("n_novel") / col("n_grams"), 6)))
  }

  val queries: Map[String, Q] = Map(
    // Per-doc novelty fractions (DuckDB replays the full first-owner model)
    "text_novelty" -> ((s, dir) =>
      noveltyReport(Tables.documents(s, dir)).orderBy("doc_id")),

    // Corpus roll-up: how much of the corpus is first-seen text
    "text_novelty_rate" -> ((s, dir) =>
      noveltyReport(Tables.documents(s, dir))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_grams")).as("total_grams"),
          sum(col("n_novel")).as("novel_grams"),
          round(sum(col("n_novel")) / sum(col("n_grams")), 6).as("novel_rate"))),

    // Per-doc contamination report, string n-grams (DuckDB-checkable)
    "decontaminate_report" -> ((s, dir) => {
      val (corpus, bench) = corpusBenchSplit(Tables.documents(s, dir))
      contaminationReport(corpus, bench, n = 5).orderBy("doc_id")
    }),

    // Corpus-level contamination rate: one row the driver can eyeball
    "decontaminate_rate" -> ((s, dir) => {
      val (corpus, bench) = corpusBenchSplit(Tables.documents(s, dir))
      contaminationReport(corpus, bench, n = 5)
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_contaminated_docs"),
          sum(col("n_contaminated")).cast("bigint").as("n_contaminated_grams"))
    }),

    // Hashed-gram variant (the 100 TB join key) — xxhash64 has no DuckDB
    // twin, so this is a rows-only entry; DecontaminateSpec proves it flags
    // the identical doc set as the string path.
    "decontaminate_hashed" -> ((s, dir) => {
      val (corpus, bench) = corpusBenchSplit(Tables.documents(s, dir))
      contaminationReport(corpus, bench, n = 5, hashGrams = true)
        .orderBy("doc_id")
    })
  )

  private val gramsSql =
    raw"""list_transform(
            generate_series(1, greatest(len(w) - 4, 0)),
            i -> array_to_string(w[i:i+4], ' '))"""

  // DuckDB forbids subqueries inside lambdas, so membership is checked by
  // exploding each doc's distinct grams and left-joining the benchmark set —
  // the same plan shape as the Spark side.
  private val reportSql =
    raw"""WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> x <> '') AS w
           FROM documents),
         grams AS (
           SELECT doc_id, list_distinct($gramsSql) AS grams
           FROM toks),
         exploded AS (
           SELECT grams.doc_id, g.gram
           FROM grams, UNNEST(grams.grams) AS g(gram)),
         bench AS (
           SELECT DISTINCT gram FROM exploded WHERE doc_id % 17 = 0),
         counts AS (
           SELECT e.doc_id, COUNT(*) AS n_grams,
                  SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_contaminated
           FROM exploded e LEFT JOIN bench b USING (gram)
           WHERE e.doc_id % 17 <> 0
           GROUP BY e.doc_id),
         report AS (
           SELECT grams.doc_id,
                  CAST(COALESCE(counts.n_grams, 0) AS BIGINT) AS n_grams,
                  CAST(COALESCE(counts.n_contaminated, 0) AS BIGINT) AS n_contaminated
           FROM grams LEFT JOIN counts USING (doc_id)
           WHERE grams.doc_id % 17 <> 0)"""

  // Novelty replayed relationally: the same 5-gram windows, first owner =
  // min doc_id per gram, fraction per doc (docs with no full window report
  // zero grams and novelty 0.0)
  private val noveltySql =
    raw"""WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> x <> '') AS w
           FROM documents),
         grams AS (
           SELECT doc_id, list_distinct($gramsSql) AS grams
           FROM toks),
         exploded AS (
           SELECT grams.doc_id, g.gram
           FROM grams, UNNEST(grams.grams) AS g(gram)),
         owners AS (
           SELECT gram, MIN(doc_id) AS first_doc FROM exploded GROUP BY gram),
         counts AS (
           SELECT e.doc_id, COUNT(*) AS n_grams,
                  SUM(CASE WHEN o.first_doc = e.doc_id THEN 1 ELSE 0 END) AS n_novel
           FROM exploded e JOIN owners o USING (gram)
           GROUP BY e.doc_id),
         report AS (
           SELECT d.doc_id,
                  CAST(COALESCE(c.n_grams, 0) AS BIGINT) AS n_grams,
                  CAST(COALESCE(c.n_novel, 0) AS BIGINT) AS n_novel,
                  CASE WHEN COALESCE(c.n_grams, 0) = 0 THEN 0.0
                       ELSE round(COALESCE(c.n_novel, 0) / CAST(c.n_grams AS DOUBLE), 6)
                  END AS novelty
           FROM documents d LEFT JOIN counts c USING (doc_id))"""

  val oracle: Map[String, String] = Map(
    "text_novelty" -> (noveltySql +
      " SELECT doc_id, n_grams, n_novel, novelty FROM report ORDER BY doc_id"),
    "text_novelty_rate" -> (noveltySql + """
         SELECT COUNT(*) AS n_docs,
                CAST(SUM(n_grams) AS BIGINT) AS total_grams,
                CAST(SUM(n_novel) AS BIGINT) AS novel_grams,
                round(SUM(n_novel) / CAST(SUM(n_grams) AS DOUBLE), 6) AS novel_rate
         FROM report"""),
    "decontaminate_report" -> (reportSql +
      """
         SELECT doc_id, n_grams, n_contaminated, n_contaminated > 0 AS contaminated
         FROM report ORDER BY doc_id"""),
    "decontaminate_rate" -> (reportSql +
      """
         SELECT COUNT(*) AS n_docs,
                CAST(SUM(CASE WHEN n_contaminated > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_contaminated_docs,
                CAST(SUM(n_contaminated) AS BIGINT) AS n_contaminated_grams
         FROM report""")
  )
}
