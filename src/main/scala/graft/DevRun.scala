package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

// Temporary dev runner — not committed logic; decomposes prepareCorpus cost.
object DevRun {
  def main(args: Array[String]): Unit = {
    // env/arg-driven like Bench and ProfileDetail — no machine constants
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder().master(s"local[$cpus]")
    sys.env.get("DEV_PAGE").foreach(p => b0.config("spark.buffer.pageSize", p))
    val spark = graft.queries.Tables.configure(b0, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        taskMs += s.stageInfo.taskMetrics.executorRunTime
    })
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    def t0[A](tag: String)(f: => A): A = {
      taskMs = 0
      val s = System.nanoTime(); val r = f; Thread.sleep(200)
      println(f"[devrun] $tag%-34s ${(System.nanoTime() - s) / 1e9}%7.3fs taskTime=${taskMs/1000.0}%7.1fs")
      r
    }
    val docs = graft.queries.Tables.documents(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      t0("scan")(noop(docs))
      t0("spread")(noop(graft.queries.Tables.spread(docs)))
      t0("qualityFilter(spread)")(noop(
        graft.llm.TextAnalysis.qualityFilter(graft.queries.Tables.spread(docs))))
      t0("qualityFilter(raw)")(noop(graft.llm.TextAnalysis.qualityFilter(docs)))
      val filtered = graft.llm.TextAnalysis.qualityFilter(graft.queries.Tables.spread(docs))
        .filter(col("quality_pass")).select(docs.columns.map(col).toSeq: _*)
      t0("filter-chain")(noop(filtered))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
      val deduped = filtered.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
      t0("dedup-window")(noop(deduped))
      t0("temperatureMix")(noop(graft.llm.Sampling.temperatureMix(deduped, "lang", 0.5)))
      t0("tokenCount-agg")(noop(graft.llm.Pipeline.queries("pipeline_corpus_prep")(spark, dir)))
    }
    spark.stop()
  }
}
