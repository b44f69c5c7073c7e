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

  test("compaction + expiry cannot GC the stream batch-id fence") {
    import spark.implicits._
    val t = graft.table.GraftTable.create(spark, scratchDir("ingest-fence"),
      Seq((1L, "a")).toDF("id", "s").schema)
    def batch(lo: Long): org.apache.spark.sql.DataFrame =
      (lo until lo + 5).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1)
    StreamOps.ingestBatch(t)(batch(0), 0L)
    StreamOps.ingestBatch(t)(batch(5), 1L)
    // maintenance pushes both ingest commits out of retention; the
    // compaction commit must carry the fence forward
    graft.maintenance.Maintenance.rewriteDataFiles(t, targetFileSizeBytes = 1L << 30)
    graft.maintenance.Maintenance.expireSnapshots(t, retainLast = 1)
    assert(StreamOps.lastCommittedBatchId(t) === Some(1L),
      "the batch-id fence must survive maintenance + snapshot expiry")
    StreamOps.ingestBatch(t)(batch(0), 0L) // at-least-once replay
    StreamOps.ingestBatch(t)(batch(5), 1L)
    assert(t.readLatest().count() === 10L, "replayed batches must stay skipped")
    StreamOps.ingestBatch(t)(batch(10), 2L)
    assert(t.readLatest().count() === 15L)
  }

  test("ingestBatchCompacting bounds file growth without disturbing batch ids") {
    import spark.implicits._
    val t = graft.table.GraftTable.create(spark, scratchDir("ingest-compact"),
      Seq((1L, "a")).toDF("id", "s").schema)
    def batch(lo: Long): org.apache.spark.sql.DataFrame =
      (lo until lo + 5).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1)
    val sink = StreamOps.ingestBatchCompacting(t, maxFiles = 2) _
    (0L until 5L).foreach(i => sink(batch(i * 5), i))
    assert(t.latest.files.size <= 2, s"file count ran away: ${t.latest.files.size}")
    assert(t.snapshotsList.count(_.operation == "rewrite-data-files") >= 1)
    // compaction commits carry no stream-batch-id, so the replay check
    // still sees the append history: replays skip, the next id applies
    assert(StreamOps.lastCommittedBatchId(t) === Some(4L))
    (0L until 5L).foreach(i => sink(batch(i * 5), i))
    assert(t.readLatest().count() === 25L)
    sink(batch(25), 5L)
    assert(t.readLatest().count() === 30L)
    assert(t.readLatest().select("id").distinct().count() === 30L)
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

  test("stageBatch stages from id 0 even when main's head carries a table-sink stream-batch-id") {
    import spark.implicits._
    val t = graft.table.GraftTable.create(spark, scratchDir("stage-after-ingest"),
      Seq((1L, "a")).toDF("id", "s").schema)
    def batch(lo: Long): org.apache.spark.sql.DataFrame =
      (lo until lo + 5).map(i => (i, s"v$i")).toDF("id", "s")
    // main table sink advances stream-batch-id to 3 on the MAIN log
    (0L to 3L).foreach(i => StreamOps.ingestBatch(t)(batch(i * 5), i))
    assert(StreamOps.lastCommittedBatchId(t) === Some(3L))
    // a NEW staging stream (fresh checkpoint, ids restart at 0) on a fresh
    // branch: the branch head is the base main snapshot verbatim, but the
    // branch-scoped key means none of its batches are discarded
    t.createBranch("audit")
    (0L to 2L).foreach(i => StreamOps.stageBatch(t, "audit")(batch(100 + i * 5), i))
    assert(t.branchSummary("audit")("staged-appends").toLong === 3L)
    assert(t.readBranch("audit").count() === t.readLatest().count() + 15L)
  }

  test("stageBatch replay is skipped across a publish (ids durable in the main summary)") {
    import spark.implicits._
    val t = graft.table.GraftTable.create(spark, scratchDir("stage-publish-replay"),
      Seq((1L, "a")).toDF("id", "s").schema)
    def batch(lo: Long): org.apache.spark.sql.DataFrame =
      (lo until lo + 5).map(i => (i, s"v$i")).toDF("id", "s")
    t.createBranch("audit")
    (0L to 2L).foreach(i => StreamOps.stageBatch(t, "audit")(batch(i * 5), i))
    t.publishBranch("audit")
    assert(t.readLatest().count() === 15L)
    assert(StreamOps.publishedStagedId(t, "audit") === Some(2L))
    // at-least-once replay with a LOST checkpoint: the stream re-creates the
    // branch and re-offers every batch; all are skipped via the published id
    t.createBranch("audit")
    (0L to 2L).foreach(i => StreamOps.stageBatch(t, "audit")(batch(i * 5), i))
    assert(t.branchSummary("audit").get("staged-appends").forall(_.toLong == 0L))
    // genuinely new work still stages and publishes once
    StreamOps.stageBatch(t, "audit")(batch(15), 3L)
    t.publishBranch("audit")
    assert(t.readLatest().count() === 20L)
    assert(t.readLatest().select("id").distinct().count() === 20L)
  }

  test("appendToBranch precondition is re-checked inside the CAS loop (no double-stage)") {
    import spark.implicits._
    val t = graft.table.GraftTable.create(spark, scratchDir("stage-race"),
      Seq((1L, "a")).toDF("id", "s").schema)
    t.createBranch("b")
    val key = graft.table.GraftTable.StagedStreamKeyPrefix + "b"
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    def stageOnce(): Boolean = t.appendToBranch("b", df,
      extraSummary = Map(key -> "0"),
      precondition = head => head.summary.get(key).map(_.toLong).forall(0L > _))
    // two "writers" race batch id 0: exactly one append lands
    val results = (1 to 2).map(_ => stageOnce())
    assert(results.count(identity) === 1)
    assert(t.branchSummary("b")("staged-appends").toLong === 1L)
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
