package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling and temperature-weighted source mixing. */
class SamplingSpec extends SparkSpec {

  test("qualityWeightedSample keeps better docs at a higher rate, deterministically") {
    import spark.implicits._
    // 300 high-quality docs (normal prose) vs 300 degenerate ones
    // (symbol-heavy), interleaved ids so hash buckets are comparable
    val docs = (0L until 600L).map { i =>
      val text =
        if (i % 2 == 0) "the quick brown fox jumps over the lazy dog near the quiet river " +
          s"and keeps running through the field for a while longer $i"
        else ("@@!! ##%% " * 8) + i
      (i, "en", text)
    }.toDF("doc_id", "lang", "text")
    val kept = Sampling.qualityWeightedSample(docs)
    val good = kept.filter(col("doc_id") % 2 === 0).count()
    val bad = kept.filter(col("doc_id") % 2 === 1).count()
    assert(good > bad * 2,
      s"quality docs must survive at a much higher rate: good=$good bad=$bad")
    // the floor keeps SOME low-quality docs (curriculum, not a hard filter)...
    assert(bad > 0, "minKeepPct floor should retain a slice of low-quality docs")
    // ...and membership is id-keyed: rerun is identical
    val again = Sampling.qualityWeightedSample(docs)
      .select("doc_id").as[Long].collect().sorted
    assert(again === kept.select("doc_id").as[Long].collect().sorted)
    // scores stay in [0, 1]
    val mm = kept.agg(min("quality_score"), max("quality_score")).collect()(0)
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  import spark.implicits._

  private def corpus(nBig: Int, nSmall: Int) = {
    val big = (1 to nBig).map(i => (i.toLong, "big", s"document body number $i"))
    val small = (1 to nSmall).map(i => ((10000 + i).toLong, "small", s"rare text $i"))
    (big ++ small).toDF("doc_id", "lang", "text")
  }

  test("temperatureMix damps dominant sources and spares the smallest") {
    val docs = corpus(nBig = 1000, nSmall = 50)
    val kept = Sampling.temperatureMix(docs, "lang", alpha = 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // smallest source: rate 1.0 → everything survives
    assert(kept("small") === 50L)
    // dominant source: rate sqrt(50/1000) ≈ 0.224 → roughly a fifth kept
    assert(kept("big") > 120L && kept("big") < 330L, s"big kept ${kept("big")}")
  }

  test("temperatureMix is deterministic and alpha=1 keeps everything") {
    val docs = corpus(nBig = 300, nSmall = 30)
    val a = Sampling.temperatureMix(docs, "lang", 0.5).select("doc_id")
      .as[Long].collect().sorted
    val b = Sampling.temperatureMix(docs.repartition(7), "lang", 0.5).select("doc_id")
      .as[Long].collect().sorted
    assert(a === b) // membership is content-hash-pure: partitioning-invariant
    assert(Sampling.temperatureMix(docs, "lang", 1.0).count() === 330L)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "lang", 0.0)
    }
  }

  test("the mix filter is map-only (no shuffle beyond the count agg)") {
    val docs = corpus(nBig = 100, nSmall = 10)
    val plan = Sampling.temperatureMix(docs, "lang", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mix filter must ride the scan:\n$plan")
  }

  test("tokenBudgetMixture flattens toward small sources and fills the budget") {
    import spark.implicits._
    // big source: 90 docs x 10 tokens; small: 10 docs x 10 tokens
    val docs = ((1 to 90).map(i => (i.toLong, "w w w w w w w w w w", "web")) ++
      (1 to 10).map(i => (100L + i, "w w w w w w w w w w", "books")))
      .toDF("doc_id", "text", "source")
    val r = Sampling.tokenBudgetMixture(docs, budgetTokens = 1000L)
      .collect().map(x => x.getString(0) -> x).toMap
    def d(s: String, c: String) = r(s).getDouble(r(s).fieldIndex(c))
    def l(s: String, c: String) = r(s).getLong(r(s).fieldIndex(c))
    assert(l("web", "n_tokens") === 900L && l("books", "n_tokens") === 100L)
    // alpha=0.7: share ratio (900/100)^0.7 = 9^0.7 ~ 4.66 < the 9x raw ratio
    val ratio = d("web", "share") / d("books", "share")
    assert(ratio > 4.0 && ratio < 5.5, s"alpha must flatten the 9x ratio, got $ratio")
    assert(math.abs(d("web", "share") + d("books", "share") - 1.0) < 1e-5)
    assert(math.abs(l("web", "planned_tokens") + l("books", "planned_tokens") - 1000L) <= 1L)
    // books is over-demanded (planned > available) -> epoch upsampling
    assert(l("books", "planned_tokens") > 100L && l("books", "n_epochs") >= 2L)
    assert(l("web", "n_epochs") === 1L, "under-demanded source stays within one epoch")
  }
}
