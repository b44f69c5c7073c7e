package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.table.GraftTable

/** The DSv2 streaming SINK: `df.writeStream.format("graft").start(dir)` —
  * exactly-once through Spark's epoch commits + the table's stream-batch-id
  * fence, no foreachBatch.
  */
class GraftStreamingSinkSpec extends SparkSpec {

  private def mkSource(root: String, n: Int): Unit = {
    import spark.implicits._
    val df = (1 to n).map(i => (i.toLong, s"u${i % 5}", i * 1.5)).toDF("id", "user", "v")
    // 4 files -> 4 micro-batches under maxFilesPerTrigger=1
    df.repartition(4).write.parquet(s"$root/src")
  }

  private def runSink(root: String, dir: String, checkpoint: String): Unit = {
    val schema = spark.read.parquet(s"$root/src").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/src")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$root/$checkpoint")
      .trigger(Trigger.AvailableNow())
      .start(dir)
    q.awaitTermination()
  }

  test("streaming sink appends each epoch exactly once; replay skips all") {
    import spark.implicits._
    val root = scratchDir("stream-sink")
    val dir = s"$root/t"
    mkSource(root, 100)
    val schema = spark.read.parquet(s"$root/src").schema
    val t = GraftTable.create(spark, dir, schema)
    runSink(root, dir, "cp1")
    assert(t.readLatest().count() == 100)
    assert(t.readLatest().agg(sum("id")).head.getLong(0) == 5050L)
    val streamCommits = t.snapshotsList.count(_.summary.contains("stream-batch-id"))
    assert(streamCommits == 4, s"expected 4 epoch commits, saw $streamCommits")
    // unpartitioned: staged files publish by RENAME — every data file is a
    // stream-published file, no rewrite pass
    assert(t.latest.files.nonEmpty)
    assert(t.latest.files.forall(_.path.startsWith("stream-")))
    // fresh checkpoint -> Spark replays every epoch -> the fence skips all
    runSink(root, dir, "cp2")
    assert(t.readLatest().count() == 100)
    assert(t.snapshotsList.count(_.summary.contains("stream-batch-id")) == 4)
    // no staging residue under data/_streaming
    val stagingRoot = new java.io.File(s"$dir/data/_streaming")
    def parquets(f: java.io.File): Seq[java.io.File] =
      if (!f.exists()) Nil
      else if (f.isDirectory) f.listFiles().toSeq.flatMap(parquets)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    assert(parquets(stagingRoot).isEmpty)
    // published rows read back identically through the connector
    assert(spark.read.format("graft").load(dir).orderBy("id").collect().toSeq ==
      t.readLatest().orderBy("id").collect().toSeq)
  }

  test("streaming sink into a partitioned table lands hive layout with stats") {
    import spark.implicits._
    val root = scratchDir("stream-sink-part")
    val dir = s"$root/t"
    val df = (1 to 60).map(i => (i.toLong, s"2024-06-0${i % 3 + 1}", i * 2.0))
      .toDF("id", "ds", "v")
    df.repartition(3).write.parquet(s"$root/src")
    val t = GraftTable.create(spark, dir, df.schema, partitionCols = Seq("ds"))
    val q = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/src")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$root/cp1")
      .trigger(Trigger.AvailableNow())
      .start(dir)
    q.awaitTermination()
    assert(t.readLatest().count() == 60)
    assert(t.latest.files.forall(_.partitionValues.contains("ds")))
    assert(t.snapshotsList.count(_.summary.contains("stream-batch-id")) == 3)
    assert(spark.read.format("graft").load(dir)
      .filter(col("ds") === "2024-06-02").count() == 20)
  }

  test("epoch commit publishes ONLY message-named files — zombie staging files never land") {
    import spark.implicits._
    val root = scratchDir("stream-sink-zombie")
    val dir = s"$root/t"
    val winner = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "user", "v")
    val t = GraftTable.create(spark, dir, winner.schema)
    val epochDir = s"$dir/data/_streaming/q1/0"
    winner.coalesce(1).write.parquet(s"$root/stage")
    val staged = new java.io.File(s"$root/stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    new java.io.File(epochDir).mkdirs()
    val winnerPath = s"$epochDir/part-0-1.parquet"
    java.nio.file.Files.copy(staged.toPath, java.nio.file.Paths.get(winnerPath))
    // zombie attempt's duplicate: closed parquet, same rows, abort never ran
    java.nio.file.Files.copy(staged.toPath,
      java.nio.file.Paths.get(s"$epochDir/part-0-0.parquet"))
    // torn leftover: an unclosed write — no parquet footer at all
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$epochDir/part-1-2.parquet"),
      Array[Byte](0x50, 0x41, 0x52, 0x31, 0x00))
    // a directory listing would double rows (zombie) then wedge on the torn
    // footer; message-named publish lands exactly the winner's rows
    val snap = t.commitStreamingEpoch(epochDir, 0L, Seq(winnerPath))
    assert(snap.nonEmpty)
    assert(t.readLatest().count() == 2)
    assert(t.readLatest().agg(sum("id")).head.getLong(0) == 3L)
    // the whole epoch dir is gone afterwards, zombies included
    assert(!new java.io.File(epochDir).exists())
  }

  test("epoch commit refuses when a message-named file is missing") {
    import spark.implicits._
    val root = scratchDir("stream-sink-missing")
    val dir = s"$root/t"
    val df = Seq((1L, "a", 1.0)).toDF("id", "user", "v")
    val t = GraftTable.create(spark, dir, df.schema)
    val epochDir = s"$dir/data/_streaming/q1/0"
    new java.io.File(epochDir).mkdirs()
    val ex = intercept[IllegalArgumentException] {
      t.commitStreamingEpoch(epochDir, 0L, Seq(s"$epochDir/part-0-9.parquet"))
    }
    assert(ex.getMessage.contains("missing from staging"))
  }

  test("partitioned epoch commit reads only message-named files and fences in-commit") {
    import spark.implicits._
    val root = scratchDir("stream-sink-zombie-part")
    val dir = s"$root/t"
    val df = Seq((1L, "2024-06-01", 1.0), (2L, "2024-06-02", 2.0))
      .toDF("id", "ds", "v")
    val t = GraftTable.create(spark, dir, df.schema, partitionCols = Seq("ds"))
    val epochDir = s"$dir/data/_streaming/q2/0"
    df.coalesce(1).write.parquet(s"$root/stage")
    val staged = new java.io.File(s"$root/stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    new java.io.File(epochDir).mkdirs()
    val winnerPath = s"$epochDir/part-0-1.parquet"
    java.nio.file.Files.copy(staged.toPath, java.nio.file.Paths.get(winnerPath))
    java.nio.file.Files.copy(staged.toPath,
      java.nio.file.Paths.get(s"$epochDir/part-0-0.parquet"))
    assert(t.commitStreamingEpoch(epochDir, 0L, Seq(winnerPath)).nonEmpty)
    assert(t.readLatest().count() == 2)
    // replay of the SAME epoch (fence already advanced): skipped, no commit
    new java.io.File(epochDir).mkdirs()
    java.nio.file.Files.copy(staged.toPath, java.nio.file.Paths.get(winnerPath))
    assert(t.commitStreamingEpoch(epochDir, 0L, Seq(winnerPath)).isEmpty)
    assert(t.readLatest().count() == 2)
    assert(t.snapshotsList.count(_.summary.contains("stream-batch-id")) == 1)
  }

  test("streaming sink refuses a schema that does not match the table") {
    import spark.implicits._
    val root = scratchDir("stream-sink-badschema")
    val dir = s"$root/t"
    val good = Seq((1L, "a", 1.0)).toDF("id", "user", "v")
    GraftTable.create(spark, dir, good.schema)
    val bad = Seq((1L, "a")).toDF("id", "user")
    bad.write.parquet(s"$root/src")
    val ex = intercept[Exception] {
      val q = spark.readStream.schema(bad.schema).parquet(s"$root/src")
        .writeStream.format("graft")
        .option("checkpointLocation", s"$root/cp")
        .trigger(Trigger.AvailableNow())
        .start(dir)
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(c => Option(c.getMessage)
      .exists(_.contains("does not match table"))))
  }
}
