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

  /** Fine-grained hash bucket 0..999999 (same md5 prefix as `bucket`, more
    * resolution for data-dependent rates).
    */
  private def bucket6(text: Column): Column =
    conv(substring(md5(text.cast("binary")), 1, 6), 16, 10).cast("bigint") % 1000000L

  /** Temperature-weighted source mixing (the multilingual alpha-sampling
    * step of training-data assembly, mT5/XLM-R style): source i with n_i
    * rows keeps rate r_i = (n_min / n_i)^(1-alpha), so at alpha < 1 small
    * sources are boosted toward full retention while dominant sources are
    * damped — expected picks from source i ∝ n_i^alpha. One map-side-
    * combined count per source (O(sources) on the driver), then a map-only
    * codegen'd filter: at 100 TB the mix rides the scan with one tiny agg.
    *
    * alpha = 0.5 keeps the arithmetic to IEEE-exact divide + sqrt, making
    * row membership bit-reproducible across engines (pow is not
    * correctly-rounded everywhere; sqrt is) — the oracle-checked setting.
    */
  def temperatureMix(docs0: DataFrame, sourceCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0, 1], got $alpha")
    // Materialize the input ONCE: the per-source count below is an eager
    // collect, so without the checkpoint the caller's whole upstream chain
    // (in prepareCorpus: spread + quality regexes + dedup window) executes
    // twice — once under the counts, once under the returned filter. At
    // 100 TB that is a full extra corpus pass for a tiny O(sources) agg.
    val docs = docs0.localCheckpoint(eager = true)
    val counts = docs.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureMix on an empty corpus")
    val nMin = counts.values.min
    val thresholds = counts.map { case (src, n) =>
      val rate =
        if (alpha == 0.5) math.sqrt(nMin.toDouble / n)
        else math.pow(nMin.toDouble / n, 1 - alpha)
      src -> math.floor(rate * 1000000L).toLong
    }
    val thr = thresholds.toSeq.sortBy(_._1).foldLeft(lit(0L): Column) {
      case (acc, (k, v)) => when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(bucket6(col("text")) < thr)
  }

  /** Quality-weighted sampling (the quality-curriculum step of modern
    * data pipelines — DCLM/FineWeb-style: better documents survive at a
    * higher rate instead of a hard pass/fail): each doc keeps with
    * probability `minKeepPct% + score × (100 − minKeepPct)%`, decided by a
    * deterministic doc_id-keyed hash bucket (content edits never flip
    * membership; same corpus → same sample, like [[shuffleSplit]]).
    *
    * The score ∈ [0,1] is a smooth product of the Gopher-rule metrics
    * `qualityFilter` computes — length (saturating at 100 words), distance
    * of mean word length from the ~5-char sweet spot, symbol density — all
    * per-row IEEE arithmetic on the ROUNDED metric columns, so membership
    * is bit-reproducible cross-engine. Map-only after one scan: the
    * sampling rides the scan at any corpus size.
    */
  def qualityWeightedSample(docs: DataFrame, minKeepPct: Int = 10): DataFrame = {
    require(minKeepPct >= 0 && minKeepPct < 100, s"minKeepPct in [0,100), got $minKeepPct")
    val q = TextAnalysis.qualityFilter(docs)
    val wordScore = least(col("n_words").cast("double") / 100.0, lit(1.0))
    val lenScore = lit(1.0) - least(abs(col("mean_word_len") - lit(5.0)) / 5.0, lit(1.0))
    val symScore = lit(1.0) - least(col("symbol_ratio") / 0.2, lit(1.0))
    val score = round(wordScore * lenScore * symScore, 6)
    val bucket = conv(substring(
      md5(concat(lit("q:"), col("doc_id").cast("string")).cast("binary")), 1, 6),
      16, 10).cast("bigint") % 100
    q.withColumn("quality_score", score)
      .filter(bucket.cast("double") < lit(minKeepPct) + col("quality_score") * (100 - minKeepPct))
      .select((docs.columns.map(col) :+ col("quality_score")).toSeq: _*)
  }


  /** Deterministic corpus shuffle + train/val/test split — the last step
    * before a corpus ships to training. Split membership hashes the DOC ID,
    * not the content: a document keeps its split across corpus versions even
    * when its text is re-extracted or cleaned, so a re-release can never
    * leak yesterday's training docs into tomorrow's held-out set. The
    * shuffle key hashes (epochSeed, doc_id): each epoch seed is a fresh,
    * engine- and partitioning-independent permutation. Both are map-only
    * derivations; the global order is a range-partitioned sort on the
    * uniform hash key — every partition sorts in parallel and readers
    * consume partitions in key order, no single-task stage anywhere.
    */
  /** Deterministic permutation key: md5 of (seed, doc_id) — a new epoch
    * seed reshuffles the whole corpus, same seed reproduces it exactly.
    */
  def shuffleKey(epochSeed: Long): Column =
    md5(concat_ws(":", lit(epochSeed), col("doc_id").cast("string")).cast("binary"))

  /** Split label from a shuffle key: the key's leading 24 bits mod 100
    * bucket the corpus into test/val/train at the given percentages.
    * Map-only — composable into any dataflow without forcing a shuffle.
    */
  def splitFromKey(key: Column, testPct: Int, valPct: Int): Column = {
    require(testPct >= 0 && valPct >= 0 && testPct + valPct <= 100,
      s"split percentages out of range: test=$testPct val=$valPct")
    val b = conv(substring(key, 1, 6), 16, 10).cast("bigint") % 100
    when(b < lit(testPct), lit("test"))
      .when(b < lit(testPct + valPct), lit("val"))
      .otherwise(lit("train"))
  }

  def shuffleSplit(docs: DataFrame, epochSeed: Long, testPct: Int, valPct: Int): DataFrame =
    docs.withColumn("shuffle_key", shuffleKey(epochSeed))
      .withColumn("split", splitFromKey(col("shuffle_key"), testPct, valPct))
      .repartitionByRange(col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")

  /** Cluster-balanced subsampling (data-map curation: cap each semantic
    * cluster at `cap` members so dominant clusters cannot crowd the
    * training mix — the cluster-aware complement of [[temperatureMix]]'s
    * source-level damping): within each cluster rank by a deterministic
    * id-keyed hash (stable across engines and input order) and keep the
    * first `cap`. One window over cluster-sized partitions — the cluster id
    * is the partition key at 100 TB, so every partition sorts independently
    * and nothing global moves.
    */
  def clusterBalancedSample(assigned: DataFrame, idCol: String,
      cellCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val key = conv(substring(
      md5(concat(lit("cb:"), col(idCol).cast("string")).cast("binary")), 1, 6),
      16, 10).cast("bigint")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(cellCol).orderBy(key, col(idCol))
    assigned.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= cap)
  }

  /** Token-budget mixture plan — the training-run data-recipe step: given
    * a total token budget, allocate per-source shares by temperature-
    * weighted size (`n_tokens^alpha`, the standard multilingual/multi-
    * source upsampling rule: alpha < 1 flattens toward small sources), and
    * report each source's sampling rate and epoch count (rate > 1 means
    * the source repeats — epoch upsampling).
    *
    * Shape at 100 TB: one map-side-combined token-count aggregation over
    * the corpus, then all planning arithmetic on the O(sources) table with
    * the weight total as a one-row broadcast — no second corpus pass; the
    * plan's rates feed `stratifiedSample`-style content-hash Bernoulli
    * keeps. Float parity: per-source weights round to the 1e-6 grid, the
    * weight total rounds before any ratio (same scheme as LangModel), so
    * both engines divide bit-identical doubles.
    */
  def tokenBudgetMixture(docs: DataFrame, sourceCol: String = "source",
      alpha: Double = 0.7, budgetTokens: Long = 1000000L): DataFrame = {
    val perSource = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("bigint")).as("n_tokens"))
    val weighted = perSource.withColumn("w",
      round(pow(col("n_tokens").cast("double"), lit(alpha)), 6))
    val tot = weighted.agg(round(sum(col("w")), 6).as("tw"))
    val planned = lit(budgetTokens.toDouble) * col("w") / col("tw")
    weighted.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        round(col("w") / col("tw"), 6).as("share"),
        round(planned).cast("bigint").as("planned_tokens"),
        round(planned / col("n_tokens"), 6).as("rate"),
        ceil(planned / col("n_tokens")).cast("bigint").as("n_epochs"))
  }

  val queries: Map[String, Q] = Map(
    // Token-budget mixture plan: alpha=0.7 temperature over sources, 1M
    // token budget; per-source share/rate/epochs (DuckDB-checked)
    "sample_token_budget" -> ((s, dir) =>
      tokenBudgetMixture(graft.queries.Tables.documents(s, dir))
        .orderBy("source")),

    // Stratified deterministic sample: halve English, keep 10% Chinese,
    // 25% everything else; per-stratum counts + id checksum
    "sample_stratified" -> ((s, dir) =>
      stratifiedSample(Tables.documents(s, dir), "lang",
        Map("en" -> 50, "zh" -> 10), defaultPct = 25)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
        .orderBy("lang")),

    // Deterministic shuffle + 10/5/85 test/val/train split at epoch seed 7:
    // per-doc split assignment and permutation key, bit-identical
    // cross-engine (md5 of the same utf8 bytes)
    "sample_shuffle_split" -> ((s, dir) =>
      shuffleSplit(Tables.documents(s, dir), epochSeed = 7L, testPct = 10, valPct = 5)
        .select(col("doc_id"), col("split"), col("shuffle_key"))),

    // Quality-curriculum sampling: keep rate rises with the doc's quality
    // score; per-lang kept counts, id checksum, and micro-scaled score sum
    // (integer — no float accumulation crosses the engine boundary)
    "sample_quality_weighted" -> ((s, dir) =>
      qualityWeightedSample(Tables.documents(s, dir))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("kept_id_sum"),
          sum(round(col("quality_score") * 1e6).cast("bigint")).as("score_sum_micro"))
        .orderBy("lang")),

    // Temperature mixing at alpha=0.5 over the language column: the
    // smallest language keeps ~100%, dominant ones are damped toward
    // sqrt-proportional representation; per-source counts + id checksum
    "sample_temperature" -> ((s, dir) =>
      temperatureMix(Tables.documents(s, dir), "lang", alpha = 0.5)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
        .orderBy("lang"))
  )

  val oracle: Map[String, String] = Map(
    "sample_token_budget" ->
      raw"""WITH tk AS (SELECT source,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
                FROM documents),
           ps AS (SELECT source, COUNT(*) AS n_docs,
                    CAST(SUM(nt) AS BIGINT) AS n_tokens
                  FROM tk GROUP BY source),
           w AS (SELECT *, round(pow(CAST(n_tokens AS DOUBLE), 0.7), 6) AS w
                 FROM ps),
           t AS (SELECT round(SUM(w), 6) AS tw FROM w)
         SELECT source, n_docs, n_tokens,
                round(w / tw, 6) AS share,
                CAST(round(CAST(1000000 AS DOUBLE) * w / tw) AS BIGINT) AS planned_tokens,
                round(CAST(1000000 AS DOUBLE) * w / tw / n_tokens, 6) AS rate,
                CAST(ceil(CAST(1000000 AS DOUBLE) * w / tw / n_tokens) AS BIGINT) AS n_epochs
         FROM w CROSS JOIN t ORDER BY source""",
    "sample_shuffle_split" ->
      """SELECT doc_id,
           CASE WHEN b < 10 THEN 'test' WHEN b < 15 THEN 'val' ELSE 'train' END AS split,
           h AS shuffle_key
         FROM (SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS h,
                      CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS b
               FROM documents)""",
    "sample_quality_weighted" ->
      raw"""WITH q AS (
           SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_words,
             round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
               / GREATEST(len(string_split_regex(trim(text), '\s+')), 1), 4) AS mwl,
             round(CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
               / GREATEST(length(text), 1), 4) AS sr
           FROM documents),
         sc AS (
           SELECT doc_id, lang,
             round(LEAST(CAST(n_words AS DOUBLE) / 100.0, 1.0)
               * (1.0 - LEAST(abs(mwl - 5.0) / 5.0, 1.0))
               * (1.0 - LEAST(sr / 0.2, 1.0)), 6) AS score
           FROM q),
         kept AS (
           SELECT * FROM sc
           WHERE CAST(CAST(('0x' || substr(md5('q:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS DOUBLE)
                 < 10 + score * 90)
         SELECT lang, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
                CAST(SUM(CAST(round(score * 1000000) AS BIGINT)) AS BIGINT) AS score_sum_micro
         FROM kept GROUP BY lang ORDER BY lang""",
    "sample_stratified" ->
      """SELECT lang, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
         FROM documents
         WHERE CAST(('0x' || substr(md5(text), 1, 6)) AS BIGINT) % 100 <
               CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 10 ELSE 25 END
         GROUP BY lang ORDER BY lang""",
    "sample_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
              m AS (SELECT MIN(n) AS nmin FROM c),
              r AS (SELECT lang, CAST(FLOOR(SQRT(CAST(nmin AS DOUBLE) / n) * 1000000) AS BIGINT) AS thr
                    FROM c, m)
         SELECT d.lang, COUNT(*) AS n_kept, CAST(SUM(d.doc_id) AS BIGINT) AS kept_id_sum
         FROM documents d JOIN r ON d.lang = r.lang
         WHERE CAST(('0x' || substr(md5(d.text), 1, 6)) AS BIGINT) % 1000000 < r.thr
         GROUP BY d.lang ORDER BY d.lang"""
  )
}
