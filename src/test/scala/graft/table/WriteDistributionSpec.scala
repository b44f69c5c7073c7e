package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned appends distribute via AQE REBALANCE on the partition columns:
  * a hot partition value splits into multiple bounded files (write
  * parallelism + target file size) while small values still coalesce to one
  * file each — the failure mode being excluded is one unbounded single-task
  * file per partition value per commit.
  */
class WriteDistributionSpec extends SparkSpec {

  test("hot partition splits into multiple files; cold partition stays single-file") {
    import spark.implicits._
    val dir = scratchDir("rebalance-skew")
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.get(advisoryKey)
    spark.conf.set(advisoryKey, "65536") // 64 KiB target to force splitting
    try {
      // ~4 MB raw in "hot" (low-compressibility payload so shuffle-size
      // estimates stay well past the advisory target), a few rows in "cold"
      val hot = (1 to 40000).map { i =>
        ("hot", i.toLong, f"${i * 2654435761L}%x-${i * 40503L}%x-${i.toHexString}")
      }
      val cold = (1 to 8).map(i => ("cold", 1000000L + i, s"c$i"))
      val df = (hot ++ cold).toDF("p", "k", "payload")
      val t = GraftTable.create(spark, dir, df.schema, Seq("p"))
      t.append(df)

      val files = t.latest.files
      val hotFiles = files.filter(_.partitionValues.get("p").contains("hot"))
      val coldFiles = files.filter(_.partitionValues.get("p").contains("cold"))
      assert(hotFiles.size > 1,
        s"hot partition should split past the advisory size, got ${hotFiles.size} file(s)")
      assert(coldFiles.size == 1,
        s"cold partition should coalesce to one file, got ${coldFiles.size}")

      // content survives the split-and-coalesce intact
      val back = t.readLatest()
      assert(back.count() == 40008L)
      assert(back.filter(col("p") === "hot").agg(sum("k")).head.getLong(0) ==
        (1 to 40000).map(_.toLong).sum)
      // every row landed in the directory its partition value names
      assert(back.filter(col("p") === "cold").count() == 8L)
    } finally spark.conf.set(advisoryKey, prev)
  }

  test("rebalance-split files each stay internally sorted under sticky sort-order") {
    import spark.implicits._
    val dir = scratchDir("rebalance-sorted")
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.get(advisoryKey)
    spark.conf.set(advisoryKey, "65536")
    try {
      val hot = (1 to 40000).map { i =>
        ("hot", (i * 2654435761L) % 999983L, f"${i * 40503L}%x-${i.toHexString}")
      }
      val df = hot.toDF("p", "k", "payload")
      val t = GraftTable.create(spark, dir, df.schema, Seq("p"),
        properties = Map(GraftTable.SortOrderProp -> "k"))
      t.append(df)
      val files = t.latest.files
      assert(files.size > 1, "the hot partition should have split")
      // every file is individually sorted on k — the WRITE ORDERED BY
      // contract survives AQE splitting a partition value across tasks
      files.foreach { f =>
        val ks = spark.read.parquet(s"$dir/data/${f.path}")
          .select("k").collect().map(_.getLong(0))
        assert(ks.sameElements(ks.sorted), s"file ${f.path} not sorted within itself")
      }
    } finally spark.conf.set(advisoryKey, prev)
  }

  test("write.target-file-size-bytes sizes rebalance splits; conf restored after") {
    import spark.implicits._
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val before = spark.conf.getOption(advisoryKey)
    val rows = (1 to 40000).map { i =>
      ("only", (i * 2654435761L) % 999983L, f"${i * 40503L}%x-${i.toHexString}")
    }.toDF("p", "k", "payload")
    // a tiny target (factor pinned to 1.0) must SPLIT the single partition
    // value into many small files...
    val dirSmall = scratchDir("tfs-small")
    val tSmall = GraftTable.create(spark, dirSmall, rows.schema, Seq("p"),
      properties = Map(GraftTable.TargetFileSizeProp -> (64L * 1024).toString,
        GraftTable.ShuffleCompressionFactorProp -> "1.0"))
    tSmall.append(rows)
    assert(tSmall.latest.files.size > 1,
      s"64 KB target should split: got ${tSmall.latest.files.size} files")
    // ...while a huge target keeps it one file per partition value
    val dirBig = scratchDir("tfs-big")
    val tBig = GraftTable.create(spark, dirBig, rows.schema, Seq("p"),
      properties = Map(GraftTable.TargetFileSizeProp -> (1L << 30).toString))
    tBig.append(rows)
    assert(tBig.latest.files.size === 1,
      s"1 GB target should not split: got ${tBig.latest.files.size} files")
    // the session advisory is restored either way
    assert(spark.conf.getOption(advisoryKey) === before,
      "write leaked the advisory partition size into the session")
  }

  test("unpartitioned appends keep the caller's partitioning (no extra shuffle)") {
    import spark.implicits._
    val dir = scratchDir("rebalance-unpart")
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(3)
    val t = GraftTable.create(spark, dir, df.schema)
    t.append(df)
    // 3 input partitions → 3 files: the write did not re-shuffle
    assert(t.latest.files.size == 3)
    assert(t.readLatest().count() == 100L)
  }
}
