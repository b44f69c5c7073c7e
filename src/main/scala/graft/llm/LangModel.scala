package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** N-gram language-model perplexity scoring over the `documents` table —
  * the CCNet-style quality signal (Wenzek et al. 2019, arXiv:1911.00359:
  * docs whose LM perplexity is far above the corpus norm are boilerplate,
  * gibberish, or the wrong language; CCNet used a KenLM 5-gram, this is the
  * same statistic from a corpus-trained bigram model with add-one
  * smoothing).
  *
  * Model: tokens are the BM25 tokenization (lowercase whitespace words)
  * wrapped in `<s>`/`</s>` markers; P(w2|w1) = (C(w1,w2)+1) / (C(w1)+V)
  * where C(w1) counts w1 as a bigram CONTEXT and V is the distinct-target
  * vocabulary. Per doc: cross-entropy H = -mean(log2 P) over its
  * transitions and perplexity 2^H.
  *
  * Scale design: the bigram explode is LINEAR in token count (an in-row
  * `transform(sequence)` — never a self-join of the token stream); the
  * model tables are vocabulary-sized, not corpus-sized, so the count
  * aggregations and the (w1,w2)/(w1) scoring joins shuffle narrow rows on
  * high-cardinality keys; the vocab scalar is a one-row broadcast. At
  * 100 TB the model fit is one agg pass and scoring is two equi-joins
  * against vocab-bounded sides (broadcastable when the vocab is small).
  *
  * Cross-engine float parity: each transition's addend is `round(log2 p,
  * 6)` — identical in both engines up to a 1-ulp libm difference that the
  * rounding absorbs. The per-doc SUM of those addends is rounded to 6
  * BEFORE the division: the true sum is itself a 1e-6 grid point, so the
  * fold-order ulps (~1e-13) can never flip that round, and both engines
  * then divide bit-identical doubles — the final 4-decimal cross-entropy
  * and 2-decimal perplexity have no knife-edge (the naive mean DID flip a
  * 5.04615 boundary at sf0.01 before this ordering).
  */
object LangModel {
  type Q = (SparkSession, String) => DataFrame

  private def words(text: Column): Column =
    filter(split(lower(trim(coalesce(text, lit("")))), "\\s+"), w => w =!= "")

  /** Exploded (doc_id, w1, w2) transition stream, `<s>`/`</s>` included
    * (an empty doc contributes the single transition `<s>` -> `</s>`).
    */
  def bigrams(docs: DataFrame): DataFrame = {
    val arr = concat(array(lit("<s>")), words(col("text")), array(lit("</s>")))
    graft.queries.Tables.spread(docs).select(col("doc_id"), arr.as("a"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("a")) - 2),
          i => struct(element_at(col("a"), i + 1).as("w1"),
            element_at(col("a"), i + 2).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Per-doc cross-entropy + perplexity under the corpus-trained bigram
    * model: (doc_id, n_trans, cross_entropy, ppl).
    */
  def perplexity(docs: DataFrame): DataFrame = {
    val bg = bigrams(docs)
    val bgCounts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val ctxCounts = bgCounts.groupBy("w1").agg(sum("cb").as("cu"))
    val vocab = bgCounts.agg(count_distinct(col("w2")).as("v"))
    // The addends are 6-decimal grid points, so their true sum is too:
    // rounding the SUM to 6 absorbs the engines' fold-order ulps and both
    // engines then divide bit-identical doubles — the per-doc mean never
    // lands on a knife-edge of the final 4-decimal round.
    val ce = -round(sum(col("lp")), 6) / count(lit(1))
    bg.join(bgCounts, Seq("w1", "w2"))
      .join(ctxCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp",
        round(log2((col("cb") + lit(1.0)) / (col("cu") + col("v"))), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"),
        round(ce, 4).as("cross_entropy"),
        round(pow(lit(2.0), ce), 2).as("ppl"))
  }

  val queries: Map[String, Q] = Map(
    // Per-doc LM perplexity report (DuckDB replays the whole model fit)
    "text_lm_perplexity" -> ((s, dir) =>
      perplexity(Tables.documents(s, dir)).orderBy("doc_id")),

    // The filter consumer: how many docs a CCNet-style "above 2x median
    // perplexity" cut would drop. EXACT median (one-row broadcast back over
    // the scores — never a driver collect), so the whole entry is
    // oracle-checked; the 2-decimal ppl inputs make the median and the
    // 2x-median comparison grid-exact in both engines.
    "text_lm_ppl_filter" -> ((s, dir) => {
      val p = perplexity(Tables.documents(s, dir))
      val med = p.agg(expr("percentile(ppl, 0.5)").as("med"))
      p.crossJoin(broadcast(med))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("ppl") > lit(2.0) * col("med"), 1L).otherwise(0L)).as("n_dropped"),
          round(min(col("med")), 2).as("median_ppl"),
          round(max(col("ppl")), 2).as("max_ppl"))
    })
  )

  private val modelCte =
    raw"""WITH wl AS (
           SELECT doc_id,
                  list_concat(list_concat(['<s>'],
                    list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                x -> x <> '')), ['</s>']) AS a
           FROM documents),
         ex AS (SELECT doc_id, unnest(range(1, len(a))) AS i, a FROM wl),
         bg AS (SELECT doc_id, a[i] AS w1, a[i + 1] AS w2 FROM ex),
         cnt AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
         ctx AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu FROM cnt GROUP BY 1),
         v AS (SELECT COUNT(DISTINCT w2) AS v FROM cnt),
         lp AS (
           SELECT bg.doc_id,
                  round(log2((CAST(cb AS DOUBLE) + 1)
                             / (CAST(cu AS DOUBLE) + CAST(v.v AS DOUBLE))), 6) AS lp
           FROM bg JOIN cnt USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v),
         scored AS (
           SELECT doc_id, COUNT(*) AS n_trans,
                  round(-round(SUM(lp), 6) / COUNT(*), 4) AS cross_entropy,
                  round(pow(2.0, -round(SUM(lp), 6) / COUNT(*)), 2) AS ppl
           FROM lp GROUP BY doc_id)"""

  val oracle: Map[String, String] = Map(
    "text_lm_perplexity" -> (modelCte +
      " SELECT doc_id, n_trans, cross_entropy, ppl FROM scored ORDER BY doc_id"),
    // quantile_cont = Spark's exact interpolating `percentile`
    "text_lm_ppl_filter" -> (modelCte + raw""",
         med AS (SELECT quantile_cont(ppl, 0.5) AS med FROM scored)
         SELECT COUNT(*) AS n_docs,
                CAST(SUM(CASE WHEN ppl > 2.0 * med THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dropped,
                round(MIN(med), 2) AS median_ppl,
                round(MAX(ppl), 2) AS max_ppl
         FROM scored CROSS JOIN med""")
  )
}
