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
    // Quality-filter BEFORE the dedup window (guide §2.3: filter before the
    // shuffle): the metrics are pure functions of `text`, so every member of
    // an md5(text) dedup group shares one verdict and filter∘dedup ≡
    // dedup∘filter — same survivors, but the regex-heavy metric pass runs
    // map-side on the (spread) scan and the window shuffles only passing
    // rows. Tables.spread: a single-split local scan would otherwise run
    // the whole metric pass on one core; identity at production scale.
    val filtered = TextAnalysis.qualityFilter(Tables.spread(docs))
      .filter(col("quality_pass"))
      .select(docs.columns.map(col).toSeq: _*)
    val w = Window.partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    val deduped = filtered.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    Sampling.temperatureMix(deduped, "lang", alpha = 0.5)
  }

  /** The FULL corpus prep (VERDICT r9 #6): `prepareCorpus`'s dedup → filter
    * → mix, then exact-SPAN decontamination (drop any doc whose k-word-span
    * duplication fraction against the surviving corpus exceeds
    * `maxDupFrac` — boilerplate/quotation contamination that whole-doc
    * dedup cannot see), then the deterministic epoch-seeded train/val/test
    * split — one dataflow ending where a training run would pick it up.
    *
    * Shuffle ledger: one hash shuffle (dedup window) + one small agg (mix
    * rates) from `prepareCorpus`, two span shuffles (gram MIN-agg + per-doc
    * re-agg) from `spanDupStats`, and a broadcast-able stats join back; the
    * split label is map-only (`splitFromKey` — no repartition here; callers
    * writing epochs add their own `repartitionByRange`).
    */
  def prepareCorpusV2(docs: DataFrame, spanK: Int = 8, maxDupFrac: Double = 0.5,
      epochSeed: Long = 7L, testPct: Int = 10, valPct: Int = 5,
      hashedSpans: Boolean = true): DataFrame = {
    // ONE materialized corpus copy, not two (VERDICT r21 #2): temperatureMix
    // inside prepareCorpus already eagerly checkpoints the dedup+filter
    // output (its per-source counts collect needs the blocks), and `mixed`
    // is only a map-side hash filter over those cached blocks — so the span
    // stage's two consumers and the decon join re-run just that filter per
    // reference instead of pinning a SECOND full copy of the corpus in
    // executor storage back-to-back with the first. The checkpoint blocks
    // are released by Spark's ContextCleaner once the returned frame is no
    // longer referenced.
    val mixed = prepareCorpus(docs)
    // default = the 100 TB span keying (8-byte rolling-hash grams, ~6x
    // narrower shuffles); string grams only where a SQL oracle must recompute
    // the spans (SpanDedupSpec proves the two keyings produce equal stats)
    val spanStats =
      if (hashedSpans) Dedup.spanDupStatsHashed(mixed, k = spanK)
      else Dedup.spanDupStats(mixed, k = spanK)
    val spans = spanStats.select(col("doc_id"), col("dup_frac"))
    mixed.join(spans, Seq("doc_id"), "left")
      .filter(coalesce(col("dup_frac"), lit(0.0)) <= maxDupFrac)
      .drop("dup_frac")
      .withColumn("split",
        Sampling.splitFromKey(Sampling.shuffleKey(epochSeed), testPct, valPct))
  }

  /** V2 plus the EMBEDDING modality: SemDeDup verdicts (computed corpus-wide
    * over the embedding table — the verdict set is independent of the text
    * chain, so the two modalities run as parallel branches of one dataflow)
    * joined back on doc_id = vec_id; a doc drops iff its vector exists AND
    * is flagged a semantic duplicate. Docs without a vector pass through —
    * the text chain already judged them.
    *
    * Shuffle ledger on top of v2: the semantic branch's centroid agg
    * (k-row result), the cell-local verify join, and one broadcast-able
    * verdict join back — the corpus is never reshuffled for the verdicts.
    */
  def prepareCorpusV3(docs: DataFrame, embeddings: DataFrame,
      semanticThreshold: Double = 0.4, spanK: Int = 8, maxDupFrac: Double = 0.5,
      epochSeed: Long = 7L, testPct: Int = 10, valPct: Int = 5,
      hashedSpans: Boolean = true): DataFrame = {
    val base = prepareCorpusV2(docs, spanK, maxDupFrac, epochSeed, testPct,
      valPct, hashedSpans)
    val verdicts = Similarity.semanticDedup(embeddings, semanticThreshold)
      .select(col("vec_id").as("doc_id"), col("is_dup"))
    base.join(verdicts, Seq("doc_id"), "left")
      .filter(!coalesce(col("is_dup"), lit(false)))
      .drop("is_dup")
  }

  /** V3 plus the data-recipe FINAL step: cluster-balance the surviving mix
    * — cap each semantic cell (the SemDeDup assignment's clusters, computed
    * once and reused for both the dedup verdicts and the balancing) at
    * `clusterCap` docs by the deterministic id-keyed hash rank, so dominant
    * semantic clusters cannot crowd the training mix. Docs without a vector
    * pass through (no cell to balance — the text chain already judged
    * them). The complete multi-modal curation: dedup → quality → mix →
    * span-decon → semantic-dedup → cluster-balance → split.
    *
    * Shuffle ledger on top of v3: NONE new — the balancing rank rides a
    * window over the same cell partitioning the semantic verdicts already
    * produced (cell = partition key at 100 TB).
    */
  def prepareCorpusV4(docs: DataFrame, embeddings: DataFrame,
      clusterCap: Int = 20, semanticThreshold: Double = 0.4, spanK: Int = 8,
      maxDupFrac: Double = 0.5, epochSeed: Long = 7L, testPct: Int = 10,
      valPct: Int = 5, hashedSpans: Boolean = true): DataFrame = {
    val base = prepareCorpusV2(docs, spanK, maxDupFrac, epochSeed, testPct,
      valPct, hashedSpans)
    val sem = Similarity.semanticDedup(embeddings, semanticThreshold)
      .select(col("vec_id").as("doc_id"), col("cell"), col("is_dup"))
    val joined = base.join(sem, Seq("doc_id"), "left")
      .filter(!coalesce(col("is_dup"), lit(false)))
    // the same deterministic rank as Sampling.clusterBalancedSample, with
    // the vectorless (null-cell) group exempt from the cap
    val key = conv(substring(
      md5(concat(lit("cb:"), col("doc_id").cast("string")).cast("binary")), 1, 6),
      16, 10).cast("bigint")
    val w = Window.partitionBy("cell").orderBy(key, col("doc_id"))
    joined.withColumn("_rk", row_number().over(w))
      .filter(col("cell").isNull || col("_rk") <= clusterCap)
      .drop("_rk", "cell", "is_dup")
  }

  val queries: Map[String, Q] = Map(
    "pipeline_corpus_prep" -> ((s, dir) =>
      prepareCorpus(Tables.documents(s, dir))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("lang")),

    // The complete chain through span decontamination and split assignment,
    // rolled up per (lang, split) — the integration surface a training-data
    // job actually consumes
    "pipeline_corpus_prep_v2" -> ((s, dir) =>
      // hashed span keys (the 100 TB default): 8-byte gram rows through the
      // two span shuffles instead of ~50-byte strings — SpanDedupSpec proves
      // the stats frames equal, and the (lang, split) rollup is byte-identical
      // against the string-keyed oracle (r22 A/B at sf0.1)
      prepareCorpusV2(Tables.documents(s, dir))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("lang", "split")),

    // Both modalities in one dataflow: the v2 text chain joined with the
    // embedding table's SemDeDup verdicts — fully oracle-checked (every
    // stage including the centroid build is SQL)
    "pipeline_corpus_prep_v3" -> ((s, dir) =>
      prepareCorpusV3(Tables.documents(s, dir), Tables.embeddings(s, dir))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("lang", "split")),

    // The capstone: v3 plus cluster-balanced capping of the final mix —
    // every stage including the cell assignment and the cap rank replayed
    // by the oracle
    "pipeline_corpus_prep_v4" -> ((s, dir) =>
      prepareCorpusV4(Tables.documents(s, dir), Tables.embeddings(s, dir))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("lang", "split"))
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
         GROUP BY k.lang ORDER BY k.lang""",
    "pipeline_corpus_prep_v2" ->
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
               FROM c, m),
         mixed AS (
           SELECT k.doc_id, k.lang, k.text
           FROM kept k JOIN r ON k.lang = r.lang
           WHERE CAST(('0x' || substr(md5(k.text), 1, 6)) AS BIGINT) % 1000000 < r.thr),
         toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
               w -> w <> '') AS w
           FROM mixed),
         grams AS (
           SELECT doc_id, UNNEST(list_distinct(
             CASE WHEN len(w) < 8 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(generate_series(1, len(w) - 7),
                         i -> array_to_string(w[i:i+7], ' ')) END)) AS gram
           FROM toks),
         own AS (SELECT gram, MIN(doc_id) AS owner FROM grams GROUP BY gram),
         sp AS (
           SELECT g.doc_id,
                  CAST(SUM(CASE WHEN o.owner < g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                    / COUNT(*) AS dup_frac
           FROM grams g JOIN own o USING (gram) GROUP BY g.doc_id),
         decon AS (
           SELECT mx.doc_id, mx.lang, mx.text
           FROM mixed mx LEFT JOIN sp ON mx.doc_id = sp.doc_id
           WHERE COALESCE(sp.dup_frac, 0) <= 0.5)
         SELECT lang,
                CASE WHEN b < 10 THEN 'test' WHEN b < 15 THEN 'val' ELSE 'train' END AS split,
                COUNT(*) AS n_docs,
                CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
                CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM (SELECT *,
                 CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS b
               FROM decon)
         GROUP BY lang, split ORDER BY lang, split""",
    // v2's chain verbatim, then the SemDeDup verdicts over the embedding
    // table (the dedup_semantic oracle's CTEs) joined on doc_id = vec_id
    "pipeline_corpus_prep_v3" ->
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
               FROM c, m),
         mixed AS (
           SELECT k.doc_id, k.lang, k.text
           FROM kept k JOIN r ON k.lang = r.lang
           WHERE CAST(('0x' || substr(md5(k.text), 1, 6)) AS BIGINT) % 1000000 < r.thr),
         toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
               w -> w <> '') AS w
           FROM mixed),
         grams AS (
           SELECT doc_id, UNNEST(list_distinct(
             CASE WHEN len(w) < 8 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(generate_series(1, len(w) - 7),
                         i -> array_to_string(w[i:i+7], ' ')) END)) AS gram
           FROM toks),
         own AS (SELECT gram, MIN(doc_id) AS owner FROM grams GROUP BY gram),
         sp AS (
           SELECT g.doc_id,
                  CAST(SUM(CASE WHEN o.owner < g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                    / COUNT(*) AS dup_frac
           FROM grams g JOIN own o USING (gram) GROUP BY g.doc_id),
         decon AS (
           SELECT mx.doc_id, mx.lang, mx.text
           FROM mixed mx LEFT JOIN sp ON mx.doc_id = sp.doc_id
           WHERE COALESCE(sp.dup_frac, 0) <= 0.5),
         ev AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         expl AS (
           SELECT label AS cell, p AS pos, emb[p] AS v
           FROM ev, LATERAL (SELECT unnest(generate_series(1, len(emb))) AS p) t),
         cm AS (SELECT cell, pos, avg(v) AS mu FROM expl GROUP BY cell, pos),
         cent AS (SELECT cell, list(mu ORDER BY pos) AS centroid FROM cm GROUP BY cell),
         assign AS (
           SELECT vec_id, emb, cell FROM (
             SELECT ev.vec_id, ev.emb, cent.cell,
                    row_number() OVER (PARTITION BY ev.vec_id
                      ORDER BY list_cosine_similarity(ev.emb, cent.centroid) DESC, cell) AS rn
             FROM ev CROSS JOIN cent) WHERE rn = 1),
         semdup AS (
           SELECT a.vec_id
           FROM assign a JOIN assign p ON p.cell = a.cell AND p.vec_id < a.vec_id
           WHERE NOT isnan(list_cosine_similarity(a.emb, p.emb))
             AND list_cosine_similarity(a.emb, p.emb) >= 0.4
           GROUP BY a.vec_id),
         fin AS (
           SELECT d.* FROM decon d LEFT JOIN semdup s ON d.doc_id = s.vec_id
           WHERE s.vec_id IS NULL)
         SELECT lang,
                CASE WHEN b < 10 THEN 'test' WHEN b < 15 THEN 'val' ELSE 'train' END AS split,
                COUNT(*) AS n_docs,
                CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
                CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM (SELECT *,
                 CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS b
               FROM fin)
         GROUP BY lang, split ORDER BY lang, split""",
    "pipeline_corpus_prep_v4" ->
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
               FROM c, m),
         mixed AS (
           SELECT k.doc_id, k.lang, k.text
           FROM kept k JOIN r ON k.lang = r.lang
           WHERE CAST(('0x' || substr(md5(k.text), 1, 6)) AS BIGINT) % 1000000 < r.thr),
         toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
               w -> w <> '') AS w
           FROM mixed),
         grams AS (
           SELECT doc_id, UNNEST(list_distinct(
             CASE WHEN len(w) < 8 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(generate_series(1, len(w) - 7),
                         i -> array_to_string(w[i:i+7], ' ')) END)) AS gram
           FROM toks),
         own AS (SELECT gram, MIN(doc_id) AS owner FROM grams GROUP BY gram),
         sp AS (
           SELECT g.doc_id,
                  CAST(SUM(CASE WHEN o.owner < g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                    / COUNT(*) AS dup_frac
           FROM grams g JOIN own o USING (gram) GROUP BY g.doc_id),
         decon AS (
           SELECT mx.doc_id, mx.lang, mx.text
           FROM mixed mx LEFT JOIN sp ON mx.doc_id = sp.doc_id
           WHERE COALESCE(sp.dup_frac, 0) <= 0.5),
         ev AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         expl AS (
           SELECT label AS cell, p AS pos, emb[p] AS v
           FROM ev, LATERAL (SELECT unnest(generate_series(1, len(emb))) AS p) t),
         cm AS (SELECT cell, pos, avg(v) AS mu FROM expl GROUP BY cell, pos),
         cent AS (SELECT cell, list(mu ORDER BY pos) AS centroid FROM cm GROUP BY cell),
         assign AS (
           SELECT vec_id, emb, cell FROM (
             SELECT ev.vec_id, ev.emb, cent.cell,
                    row_number() OVER (PARTITION BY ev.vec_id
                      ORDER BY list_cosine_similarity(ev.emb, cent.centroid) DESC, cell) AS rn
             FROM ev CROSS JOIN cent) WHERE rn = 1),
         semdup AS (
           SELECT a.vec_id
           FROM assign a JOIN assign p ON p.cell = a.cell AND p.vec_id < a.vec_id
           WHERE NOT isnan(list_cosine_similarity(a.emb, p.emb))
             AND list_cosine_similarity(a.emb, p.emb) >= 0.4
           GROUP BY a.vec_id),
         fin AS (
           SELECT d.doc_id, d.lang, d.text, asg.cell
           FROM decon d
           LEFT JOIN assign asg ON d.doc_id = asg.vec_id
           LEFT JOIN semdup s ON d.doc_id = s.vec_id
           WHERE s.vec_id IS NULL),
         capped AS (
           SELECT doc_id, lang, text FROM (
             SELECT f.*,
               row_number() OVER (PARTITION BY cell
                 ORDER BY CAST(('0x' || substr(md5('cb:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT),
                          doc_id) AS rk
             FROM fin f)
           WHERE cell IS NULL OR rk <= 20)
         SELECT lang,
                CASE WHEN b < 10 THEN 'test' WHEN b < 15 THEN 'val' ELSE 'train' END AS split,
                COUNT(*) AS n_docs,
                CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
                CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM (SELECT *,
                 CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS b
               FROM capped)
         GROUP BY lang, split ORDER BY lang, split"""
  )
}
