package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Table properties + parquet bloom filters: configured key columns carry a
  * bloom filter in every written file (row-group point-lookup skipping for
  * uniformly-spread keys, where min/max bounds prune nothing), other columns
  * don't pay for one, and the properties layer versions atomically.
  */
class BloomFilterSpec extends SparkSpec {

  private def bloomColumns(t: GraftTable, relPath: String): Set[String] =
    t.bloomFilterColumns(relPath)

  test("configured columns get bloom filters; others don't; lookups stay correct") {
    import spark.implicits._
    val dir = scratchDir("bloom")
    val df = (1 to 5000).map(i => (i * 2654435761L % 1000003L, i.toLong, s"v$i"))
      .toDF("k", "seq", "v")
    val t = GraftTable.create(spark, dir, df.schema,
      properties = Map(
        GraftTable.BloomFilterColumnsProp -> "k",
        GraftTable.BloomFilterNdvProp -> "5000"))
    t.append(df)

    val file = t.latest.files.head.path
    val withBloom = bloomColumns(t, file)
    assert(withBloom == Set("k"),
      s"only the configured column should carry a bloom filter, got $withBloom")

    // point lookup through the table read stays correct (Spark's reader
    // consults the bloom on the pushed-down equality)
    val key = 3 * 2654435761L % 1000003L
    val hit = t.readLatest().filter(col("k") === key).collect()
    assert(hit.length == 1 && hit.head.getLong(1) == 3L)
    assert(t.readLatest().filter(col("k") === -1L).isEmpty)
  }

  test("properties version atomically and merge/remove correctly") {
    import spark.implicits._
    val dir = scratchDir("props")
    val df = Seq((1L, "a")).toDF("k", "v")
    val t = GraftTable.create(spark, dir, df.schema)
    assert(t.properties.isEmpty)
    t.setProperties(Map("a" -> Some("1"), "b" -> Some("2")))
    t.setProperties(Map("b" -> Some("3"), "c" -> Some("4")))
    assert(t.properties == Map("a" -> "1", "b" -> "3", "c" -> "4"))
    t.setProperties(Map("a" -> None))
    assert(t.properties == Map("b" -> "3", "c" -> "4"))
    // a table loaded fresh sees the same state
    assert(GraftTable.load(spark, dir).properties == Map("b" -> "3", "c" -> "4"))
  }

  test("compaction preserves bloom filters (properties apply to maintenance rewrites)") {
    import spark.implicits._
    val dir = scratchDir("bloom-compact")
    val df = (1 to 4000).map(i => (i * 2654435761L % 1000003L, s"v$i")).toDF("k", "v")
    val t = GraftTable.create(spark, dir, df.schema,
      properties = Map(GraftTable.BloomFilterColumnsProp -> "k"))
    (0 until 4).foreach(q => t.append(
      df.filter(col("k") % 4 === q).coalesce(1)))
    val n = graft.maintenance.Maintenance.rewriteDataFiles(t,
      targetFileSizeBytes = 512L * 1024 * 1024, minInputFiles = 2)
    assert(n.isDefined, "compaction should have rewritten the small files")
    t.latest.files.foreach { f =>
      assert(t.bloomFilterColumns(f.path) == Set("k"),
        s"compacted file ${f.path} lost its bloom filter")
    }
    assert(t.readLatest().count() === 4000L)
  }

  test("a fully dictionary-encoded chunk drops the bloom (dictionary is exact)") {
    import spark.implicits._
    val dir = scratchDir("bloom-dict")
    // 3x-repeated keys stay dictionary-encoded: parquet-mr intentionally
    // omits the bloom because the dictionary page already gives exact
    // row-group membership — point-lookup skipping still works, via
    // dictionary filtering. High-cardinality columns (the bloom's actual
    // use case) fall back to PLAIN and get the filter (first test).
    val df = (1 to 3000).map(i => ((i % 1000).toLong, s"v$i")).toDF("k", "v")
    val t = GraftTable.create(spark, dir, df.schema,
      properties = Map(GraftTable.BloomFilterColumnsProp -> "k"))
    t.append(df.coalesce(1))
    assert(bloomColumns(t, t.latest.files.head.path).isEmpty)
    assert(t.readLatest().filter(col("k") === 7L).count() == 3L)
  }

  test("sticky write.sort-order sorts every append; per-call sort overrides") {
    import spark.implicits._
    val dir = scratchDir("sort-order")
    val df = (1 to 1000).map(i => ((i * 2654435761L % 997L), s"v$i")).toDF("k", "v")
    val t = GraftTable.create(spark, dir, df.schema,
      properties = Map(GraftTable.SortOrderProp -> "k"))
    t.append(df.coalesce(1))
    // within-file monotonicity: read the single file back in storage order
    val stored = spark.read
      .parquet(s"$dir/data/${t.latest.files.head.path}")
      .select("k").collect().map(_.getLong(0))
    assert(stored.sameElements(stored.sorted),
      "append must honor the sticky sort-order property")
    // per-call override wins
    t.append(df.coalesce(1), sortWithinPartitionsCols = Seq("v"))
    val f2 = t.latest.files.sortBy(_.writtenAt).last
    val stored2 = spark.read.parquet(s"$dir/data/${f2.path}")
      .select("v").collect().map(_.getString(0))
    assert(stored2.sameElements(stored2.sorted), "per-call sort must override")
  }

  test("bloom property set AFTER a commit applies to later files only") {
    import spark.implicits._
    val dir = scratchDir("bloom-later")
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val t = GraftTable.create(spark, dir, df.schema)
    t.append(df.filter(col("k") <= 50).coalesce(1))
    t.setProperties(Map(GraftTable.BloomFilterColumnsProp -> Some("k")))
    t.append(df.filter(col("k") > 50).coalesce(1))
    val files = t.latest.files.sortBy(_.writtenAt)
    assert(bloomColumns(t, files.head.path).isEmpty)
    assert(bloomColumns(t, files.last.path) == Set("k"))
    assert(t.readLatest().count() == 100L)
  }
}
