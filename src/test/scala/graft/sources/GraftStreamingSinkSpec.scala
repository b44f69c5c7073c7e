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
