package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class StreamOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming windowed counts equal the batch equivalent") {
    val streamed = StreamOps.runAvailableNow(spark, sf, "spec_windowed",
      StreamOps.dailyTypeCounts)
      .orderBy("day", "event_type").collect()
    val batch = StreamOps.dailyTypeCounts(Tables.events(spark, sf))
      .orderBy("day", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("flatMapGroupsWithState produces final per-user totals equal to batch agg") {
    import spark.implicits._
    val result = StreamOps.runAvailableNow(spark, sf, "spec_user_stats",
      df => df.select(col("user_id"), col("value")).as[StreamOps.UserEvent]
        .transform(StreamOps.userRunningStats).toDF(),
      outputMode = "update")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val batch = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    assert(result.join(batch, "user_id")
      .filter(result("n_events") =!= batch("n_events")).count() === 0)
  }
}
