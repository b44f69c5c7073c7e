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

  test("ingestBatch skips replayed batch ids (exactly-once table sink)") {
    import spark.implicits._
    val t = graft.table.GraftTable.create(spark, scratchDir("ingest-batch"),
      Seq((1L, "a")).toDF("id", "s").schema)
    def batch(lo: Long): org.apache.spark.sql.DataFrame =
      (lo until lo + 5).map(i => (i, s"v$i")).toDF("id", "s")
    StreamOps.ingestBatch(t)(batch(0), 0L)
    StreamOps.ingestBatch(t)(batch(5), 1L)
    assert(StreamOps.lastCommittedBatchId(t) === Some(1L))
    // at-least-once replay after a restart: ids 0 and 1 must be no-ops
    StreamOps.ingestBatch(t)(batch(0), 0L)
    StreamOps.ingestBatch(t)(batch(5), 1L)
    assert(t.readLatest().count() === 10L)
    StreamOps.ingestBatch(t)(batch(10), 2L)
    assert(t.readLatest().count() === 15L)
    assert(t.readLatest().select("id").distinct().count() === 15L)
    assert(StreamOps.lastCommittedBatchId(t) === Some(2L))
  }

  test("upsertBatch: last version per key wins within and across batches, replays skipped") {
    import spark.implicits._
    val t = graft.table.GraftTable.create(spark, scratchDir("upsert-batch"),
      Seq((1L, 0L, "a")).toDF("k", "ver", "s").schema)
    t.append(Seq((1L, 0L, "seed1"), (2L, 0L, "seed2")).toDF("k", "ver", "s"))
    // within-batch dedupe: two versions of k=1 in one batch, ver=2 wins
    StreamOps.upsertBatch(t, Seq("k"), Seq("ver"))(
      Seq((1L, 1L, "v1"), (1L, 2L, "v2"), (3L, 1L, "new")).toDF("k", "ver", "s"), 0L)
    val st1 = t.readLatest().as[(Long, Long, String)].collect().sortBy(_._1)
    assert(st1 === Array((1L, 2L, "v2"), (2L, 0L, "seed2"), (3L, 1L, "new")))
    // replay of batch 0 is a no-op
    StreamOps.upsertBatch(t, Seq("k"), Seq("ver"))(
      Seq((1L, 9L, "stale-replay")).toDF("k", "ver", "s"), 0L)
    assert(t.readLatest().filter($"k" === 1).as[(Long, Long, String)].head._3 === "v2")
    // later batch wins over earlier state; untouched keys survive
    StreamOps.upsertBatch(t, Seq("k"), Seq("ver"))(
      Seq((2L, 5L, "upd2")).toDF("k", "ver", "s"), 1L)
    val st2 = t.readLatest().as[(Long, Long, String)].collect().sortBy(_._1)
    assert(st2 === Array((1L, 2L, "v2"), (2L, 5L, "upd2"), (3L, 1L, "new")))
    // all merge-on-read: no data file was ever rewritten
    assert(t.snapshotsList.filter(_.operation == "upsert-mor")
      .forall(_.summary.get("added-files").exists(_.toInt <= 1)))
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
