package graft.queries

import graft.SparkSpec

class ScaleQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed join plan contains no shuffle exchange between the scans") {
    // at test scale AQE would broadcast the small side (also exchange-free);
    // force a sort-merge join to prove the bucket co-location path works
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = ScaleQueries.queries("j5_bucketed_join")(spark, sf)
      df.collect() // let AQE finalize the plan
      // executedPlan.toString prints final plan + "== Initial Plan ==" section;
      // assert on the final plan only
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert("Bucketed: true".r.findAllIn(plan).size === 2, s"both scans bucketed:\n$plan")
      // exactly one hash exchange (the final group-by); a non-bucketed join
      // would add one per join input
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1, s"expected 1 hash exchange, got $exchanges in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("salted aggregation equals plain aggregation") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf).withColumn("v", col("value").cast("decimal(18,2)"))
    val salted = graft.operators.SkewSalting.saltedAgg(ev, "event_type", "v")
      .orderBy("event_type").collect()
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
      .orderBy("event_type").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      plain.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(salted.map(_.getDecimal(2).stripTrailingZeros).toSeq ===
      plain.map(_.getDecimal(2).stripTrailingZeros).toSeq)
  }
}
