package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of selected queries so
  * scale hazards are visible (missing pushdown, absent broadcast, shuffle
  * explosions). Usage: runMain graft.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "p3_pruned_window_agg", "a2_checksums", "j3_join_agg_revenue",
      "p4_inlist_lookup", "emb_cosine_topk", "dedup_minhash_lsh",
      "asof_join", "range_join", "sample_stratified", "text_top_terms",
      "t_mor_delete", "t_changelog", "t_zorder")
    val spark = graft.queries.Tables.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n========== $name ==========")
          println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"no such query: $name")
      }
    }
    spark.stop()
  }
}
