package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table: token counting, quality scoring, language ID (marker-word heuristic),
  * and document fingerprinting.
  *
  * Everything is a per-row codegen'd projection — no shuffle, no UDF — so these
  * scale linearly with input splits: at 100 TB each operator is a map-only pass
  * that parquet column pruning reduces to reading the `text` column alone.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  /** Whitespace token count (trim first so leading blanks don't add a token). */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: split on word boundaries and punctuation runs. */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), t => trim(t) =!= ""))

  /** Normalized fingerprint: md5 of the text with everything but [a-z0-9]
    * stripped — detects near-identical docs differing only in
    * whitespace/punctuation/case.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** Occurrences of `marker` in `text` via length arithmetic (replace is
    * left-to-right non-overlapping in both Spark and DuckDB, so the oracle
    * agrees exactly).
    */
  private def occurrences(text: Column, marker: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(marker), ""))) / marker.length

  /** Marker-word language heuristic. Ties resolve in fixed priority order
    * en > fr > de > es > zh so the result is deterministic.
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val en = occurrences(padded, " the ")
    val fr = occurrences(padded, " le ")
    val de = occurrences(padded, " der ")
    val es = occurrences(padded, " el ")
    val zh = occurrences(padded, "的")
    when(en >= fr && en >= de && en >= es && en >= zh, "en")
      .when(fr >= de && fr >= es && fr >= zh, "fr")
      .when(de >= es && de >= zh, "de")
      .when(es >= zh, "es")
      .otherwise("zh")
  }

  /** Rolling-hash-style content fingerprint over word 4-grams: min of the
    * 4-gram hashes (a 1-permutation MinHash, usable as a cheap doc
    * signature). Gram hashing runs through the native `ngram_hash`
    * expression — no per-gram string allocation.
    */
  def ngramMinHash(text: Column, n: Int = 4): Column = {
    val words = filter(split(lower(text), "[^a-z0-9]+"), w => w =!= "")
    array_min(call_function("ngram_hash",
      call_function("xxhash64_array", words), lit(n)))
  }

  /** Gopher-style quality-filter rules: documents pass when word count,
    * mean word length, and symbol density sit inside sane bounds. Returns
    * per-rule flags plus the verdict so downstream can audit WHY a doc was
    * dropped (a filter that only says "failed" is undebuggable at corpus
    * scale).
    */
  def qualityFilter(df: DataFrame,
      minWords: Int = 10, maxWords: Int = 100000,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
      maxSymbolRatio: Double = 0.1): DataFrame = {
    val ws = split(trim(col("text")), "\\s+")
    val nWords = size(ws)
    val meanLen = (length(regexp_replace(col("text"), "\\s+", "")).cast("double")) /
      greatest(nWords, lit(1))
    val symbols = length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", ""))
    val symbolRatio = symbols.cast("double") / greatest(length(col("text")), lit(1))
    df.withColumn("n_words", nWords)
      .withColumn("mean_word_len", round(meanLen, 4))
      .withColumn("symbol_ratio", round(symbolRatio, 4))
      .withColumn("ok_word_count", nWords >= minWords && nWords <= maxWords)
      .withColumn("ok_word_len", meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen)
      .withColumn("ok_symbols", symbolRatio <= maxSymbolRatio)
      .withColumn("quality_pass",
        col("ok_word_count") && col("ok_word_len") && col("ok_symbols"))
  }

  /** Exploded (doc_id, term) token stream shared by the corpus-statistics
    * operators; `minLen` drops short function words.
    */
  private def tokens(docs: DataFrame, minLen: Int): DataFrame =
    Tables.spread(docs).select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .filter(length(col("term")) >= minLen)

  /** Gopher-style repetition signals: how much of a document is the same
    * word or word 2-gram repeated. High duplicate-word / top-bigram fractions
    * mark boilerplate and degenerate generations (the line-based Gopher
    * variants are meaningless on this corpus — docs are single-line).
    *
    * Shape: MAP-ONLY — per-doc mode counts run through the native
    * `top_ngram_count` expression (one O(len) HashMap pass per row inside
    * whole-stage codegen), never an exploded (doc_id, gram) shuffle of the
    * token stream and never an interpreted HOF fold (both were tried and
    * benched 4.7 s / 7.6 s at sf0.1; the native pass is ~0.5 s — see
    * TopNgramCount's scaladoc). Ratios are exact integer ratios rounded to
    * 4, so the DuckDB oracle (which states the same counts as group-bys)
    * agrees bitwise.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val ws = filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "")
    Tables.spread(docs).select(col("doc_id"),
        size(ws).cast("bigint").as("n_words"),
        size(array_distinct(ws)).cast("bigint").as("n_distinct_words"),
        call_function("top_ngram_count", ws, lit(1)).as("top_word_count"),
        greatest(size(ws).cast("bigint") - 1L, lit(0L)).as("n_bigrams"),
        call_function("top_ngram_count", ws, lit(2)).as("top_bigram_count"))
      .withColumn("dup_word_ratio",
        round(lit(1.0) - col("n_distinct_words").cast("double") /
          greatest(col("n_words"), lit(1L)), 4))
      .withColumn("top_bigram_ratio",
        round(col("top_bigram_count").cast("double") /
          greatest(col("n_bigrams"), lit(1L)), 4))
  }

  /** Per-document salient terms: rank by (term frequency desc, document
    * frequency asc, term) — the tf-idf ordering expressed over exact
    * integers, so results are reproducible across engines with no float
    * comparison at the rank boundary. Two shuffles (tf and df aggregations)
    * plus a join on term; the per-doc window is partition-local.
    */
  def topTerms(docs: DataFrame, k: Int = 3, minTermLen: Int = 4): DataFrame = {
    val toks = tokens(docs, minTermLen)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df_, Seq("term"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk").cast("bigint").as("rnk"),
        col("term"), col("tf"), col("df"))
  }

  /** Vocabulary coverage: induce a top-`vocabSize` frequency vocabulary
    * (ties broken by term for determinism) and measure what share of the
    * token stream it covers — the OOV-rate estimate that sizes a tokenizer.
    * The vocab is tiny and broadcast; the coverage pass is map-side.
    */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 100): DataFrame = {
    val toks = tokens(docs, 1)
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(vocabSize)
    toks.join(broadcast(vocab.select(col("term"), lit(1).as("in_vocab"))),
        Seq("term"), "left")
      .agg(count(lit(1)).as("total_tokens"),
        sum(when(col("in_vocab").isNotNull, 1L).otherwise(0L)).as("covered_tokens"))
      .withColumn("vocab_size", lit(vocabSize.toLong))
  }

  val queries: Map[String, Q] = Map(
    // Corpus statistics: per-doc salient terms, integer-ranked tf-idf order
    "text_top_terms" -> ((s, dir) =>
      topTerms(Tables.documents(s, dir)).orderBy("doc_id", "rnk")),

    // Tokenizer-sizing stat: top-100 vocab coverage of the token stream
    "text_vocab_coverage" -> ((s, dir) => vocabCoverage(Tables.documents(s, dir))),

    // Repetition signals: duplicate-word and top-bigram fractions per doc
    "text_repetition" -> ((s, dir) =>
      repetitionSignals(Tables.documents(s, dir)).orderBy("doc_id")),

    // Quality-filter verdicts per doc (auditable rule flags)
    "text_quality_filter" -> ((s, dir) =>
      qualityFilter(Tables.documents(s, dir))
        .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
          "ok_word_count", "ok_word_len", "ok_symbols", "quality_pass")
        .orderBy("doc_id")),

    "text_token_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")),

    "text_quality" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          size(split(col("text"), " ")).as("n_words"),
          round(length(col("text")) / size(split(col("text"), " ")).cast("double"), 5)
            .as("avg_word_len"))
        .orderBy("doc_id")),

    "text_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    "text_lang_id" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // xxhash64 has no DuckDB twin → deterministic rows-only check
    "text_ngram_minhash" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), ngramMinHash(col("text")).as("sig"))
        .orderBy("doc_id")),

    // BPE-ish subword counting. The Spark side splits on alnum/non-alnum
    // boundaries with lookarounds (no RE2 twin), but the count it produces
    // equals (# maximal alnum runs) + (# non-blank maximal non-alnum runs),
    // which the oracle states lookaround-free — so the entry IS hash-checked.
    "text_subword_count" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "text_top_terms" ->
      raw"""WITH toks AS (
           SELECT doc_id, t.term
           FROM documents, UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS t(term)
           WHERE len(t.term) >= 4),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
         ranked AS (
           SELECT tf.doc_id, tf.term, tf.tf, df.df,
                  ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                    ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rnk
           FROM tf JOIN df USING (term))
         SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, df
         FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""",
    "text_vocab_coverage" ->
      raw"""WITH toks AS (
           SELECT doc_id, t.term
           FROM documents, UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS t(term)
           WHERE len(t.term) >= 1),
         counts AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1),
         vocab AS (SELECT term FROM counts ORDER BY cnt DESC, term ASC LIMIT 100)
         SELECT COUNT(*) AS total_tokens,
                CAST(SUM(CASE WHEN term IN (SELECT term FROM vocab) THEN 1 ELSE 0 END) AS BIGINT) AS covered_tokens,
                CAST(100 AS BIGINT) AS vocab_size
         FROM toks""",
    "text_subword_count" ->
      raw"""SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) +
                len(list_filter(regexp_extract_all(text, '[^a-zA-Z0-9]+'),
                                x -> trim(x) <> '')) AS INT) AS n_subwords
         FROM documents ORDER BY doc_id""",
    "text_repetition" ->
      raw"""WITH toks AS (
           SELECT doc_id, t.term AS gram
           FROM documents, UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS t(term)
           WHERE len(t.term) >= 1),
         ws AS (
           SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
                  COUNT(*) AS n_distinct_words,
                  CAST(MAX(cnt) AS BIGINT) AS top_word_count
           FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM toks GROUP BY 1, 2)
           GROUP BY doc_id),
         wlists AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> x <> '') AS w
           FROM documents),
         bigrams AS (
           SELECT doc_id, g.gram
           FROM (SELECT doc_id,
                   list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                     i -> array_to_string(w[i:i+1], ' ')) AS grams
                 FROM wlists), UNNEST(grams) AS g(gram)),
         bs AS (
           SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
                  CAST(MAX(cnt) AS BIGINT) AS top_bigram_count
           FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM bigrams GROUP BY 1, 2)
           GROUP BY doc_id)
         SELECT d.doc_id,
                COALESCE(ws.n_words, 0) AS n_words,
                COALESCE(ws.n_distinct_words, 0) AS n_distinct_words,
                COALESCE(ws.top_word_count, 0) AS top_word_count,
                COALESCE(bs.n_bigrams, 0) AS n_bigrams,
                COALESCE(bs.top_bigram_count, 0) AS top_bigram_count,
                round(1.0 - CAST(COALESCE(ws.n_distinct_words, 0) AS DOUBLE)
                  / GREATEST(COALESCE(ws.n_words, 0), 1), 4) AS dup_word_ratio,
                round(CAST(COALESCE(bs.top_bigram_count, 0) AS DOUBLE)
                  / GREATEST(COALESCE(bs.n_bigrams, 0), 1), 4) AS top_bigram_ratio
         FROM documents d
         LEFT JOIN ws USING (doc_id) LEFT JOIN bs USING (doc_id)
         ORDER BY doc_id""",
    "text_quality_filter" ->
      raw"""WITH q AS (
           SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_words,
                  length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace,
                  length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_symbols,
                  length(text) AS n_chars
           FROM documents),
         m AS (
           SELECT doc_id, n_words,
                  round(CAST(n_nonspace AS DOUBLE) / GREATEST(n_words, 1), 4) AS mean_word_len,
                  round(CAST(n_symbols AS DOUBLE) / GREATEST(n_chars, 1), 4) AS symbol_ratio,
                  CAST(n_nonspace AS DOUBLE) / GREATEST(n_words, 1) AS mwl_raw,
                  CAST(n_symbols AS DOUBLE) / GREATEST(n_chars, 1) AS sr_raw
           FROM q)
         SELECT doc_id, n_words, mean_word_len, symbol_ratio,
                (n_words >= 10 AND n_words <= 100000) AS ok_word_count,
                (mwl_raw >= 2.0 AND mwl_raw <= 12.0) AS ok_word_len,
                (sr_raw <= 0.1) AS ok_symbols,
                ((n_words >= 10 AND n_words <= 100000) AND
                 (mwl_raw >= 2.0 AND mwl_raw <= 12.0) AND
                 (sr_raw <= 0.1)) AS quality_pass
         FROM m ORDER BY doc_id""",
    "text_token_stats" ->
      raw"""SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens
         FROM documents ORDER BY doc_id""",
    "text_quality" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS INT) AS n_words,
           round(length(text) / CAST(len(string_split(text, ' ')) AS DOUBLE), 5) AS avg_word_len
         FROM documents ORDER BY doc_id""",
    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
         FROM documents ORDER BY doc_id""",
    "text_lang_id" ->
      """WITH s AS (
           SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
         sc AS (
           SELECT doc_id,
             (length(t) - length(replace(t, ' the ', ''))) / 5 AS en,
             (length(t) - length(replace(t, ' le ', ''))) / 4 AS fr,
             (length(t) - length(replace(t, ' der ', ''))) / 5 AS de,
             (length(t) - length(replace(t, ' el ', ''))) / 4 AS es,
             (length(t) - length(replace(t, '的', ''))) / 1 AS zh
           FROM s)
         SELECT doc_id,
           CASE
             WHEN en >= fr AND en >= de AND en >= es AND en >= zh THEN 'en'
             WHEN fr >= de AND fr >= es AND fr >= zh THEN 'fr'
             WHEN de >= es AND de >= zh THEN 'de'
             WHEN es >= zh THEN 'es'
             ELSE 'zh'
           END AS lang_pred
         FROM sc ORDER BY doc_id"""
  )
}
