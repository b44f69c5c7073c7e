package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stats-based file pruning (`planBetween`/`readBetween` — the Iceberg
  * manifest `lower_bounds`/`upper_bounds` scan-planning analog). The
  * properties under test:
  *   - files provably outside the range are skipped (selected < total);
  *   - no matching row is EVER dropped — readBetween equals the brute-force
  *     filter over the full table, including at inclusive boundaries;
  *   - files without usable stats (all-null column, stats recorded under a
  *     pre-rename physical name) are always kept.
  */
class StatsPruneSpec extends SparkSpec {

  private def kvTable(prefix: String): GraftTable = {
    import spark.implicits._
    val dir = scratchDir(prefix)
    val base = (0L until 40L).map(k => (k, s"v$k")).toDF("k", "v")
    val t = GraftTable.create(spark, dir, base.schema)
    // four single-file commits with disjoint k ranges: [0,10) [10,20) [20,30) [30,40)
    (0 until 4).foreach(i =>
      t.append(base.filter(col("k") >= i * 10 && col("k") < (i + 1) * 10).coalesce(1)))
    t
  }

  test("planBetween skips non-overlapping files and keeps every matching row") {
    val t = kvTable("statsprune-")
    val (selected, total) = t.planBetween(t.latest, "k", 12L, 27L)
    assert(total === 4)
    assert(selected.size === 2, s"expected files [10,20) and [20,30): $selected")
    val got = t.readBetween("k", 12L, 27L).select("k").collect().map(_.getLong(0)).sorted
    assert(got === (12L to 27L).toArray)
  }

  test("inclusive boundaries: a range touching a file's exact min/max keeps it") {
    val t = kvTable("statsprune-edge-")
    // hi == file 2's recorded min (20), lo == file 1's recorded max (19)
    val (selected, _) = t.planBetween(t.latest, "k", 19L, 20L)
    assert(selected.size === 2)
    val got = t.readBetween("k", 19L, 20L).select("k").collect().map(_.getLong(0)).sorted
    assert(got === Array(19L, 20L))
  }

  test("one-sided ranges prune from the open side only") {
    val t = kvTable("statsprune-open-")
    val (loOnly, _) = t.planBetween(t.latest, "k", 25L, null)
    assert(loOnly.size === 2) // [20,30) and [30,40)
    assert(t.readBetween("k", 25L, null).count() === 15)
    val (hiOnly, _) = t.planBetween(t.latest, "k", null, 5L)
    assert(hiOnly.size === 1) // [0,10)
    assert(t.readBetween("k", null, 5L).count() === 6)
    val (both, _) = t.planBetween(t.latest, "k", null, null)
    assert(both.size === 4)
    assert(t.readBetween("k", null, null).count() === 40)
  }

  test("string-column bounds prune lexicographically") {
    import spark.implicits._
    val dir = scratchDir("statsprune-str-")
    val base = Seq("apple", "banana", "cherry", "mango", "peach", "plum")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val t = GraftTable.create(spark, dir, base.schema)
    t.append(base.filter(col("s") < "d").coalesce(1))  // apple banana cherry
    t.append(base.filter(col("s") >= "d").coalesce(1)) // mango peach plum
    val (selected, total) = t.planBetween(t.latest, "s", "a", "c")
    assert(total === 2 && selected.size === 1)
    assert(t.readBetween("s", "a", "cz").select("s").collect().map(_.getString(0)).sorted
      === Array("apple", "banana", "cherry"))
  }

  test("a file whose column is all NULL has no bounds and is always kept") {
    val dir = scratchDir("statsprune-null-")
    val withVals = spark.sql("SELECT id AS k, id * 2 AS v FROM range(10)")
    val t = GraftTable.create(spark, dir, withVals.schema)
    t.append(withVals.coalesce(1))
    t.append(spark.sql("SELECT id + 10 AS k, CAST(NULL AS BIGINT) AS v FROM range(10)").coalesce(1))
    // the all-null file records no bounds for v → conservatively kept
    val (selected, total) = t.planBetween(t.latest, "v", 100L, 200L)
    assert(total === 2)
    assert(selected.size === 1 && selected.head.stats.get("v").isEmpty)
    // and rows are still exact (residual filter drops the NULLs)
    assert(t.readBetween("v", 0L, 4L).count() === 3) // v in {0,2,4}
  }

  test("files written before a rename are never pruned on the new name; files after prune") {
    import spark.implicits._
    val dir = scratchDir("statsprune-rename-")
    val base = (0L until 10L).map(k => (k, k)).toDF("k", "payload")
    val t = GraftTable.create(spark, dir, base.schema)
    t.append(base.coalesce(1)) // stats recorded under physical name "k"
    t.renameColumn("k", "k2")
    t.append((100L until 110L).map(k => (k, k)).toDF("k2", "payload").coalesce(1))
    val snap = t.latest
    // range overlapping neither file's values: the pre-rename file has no
    // stats under "k2" → kept; the post-rename file is provably outside → skipped
    val (selected, total) = t.planBetween(snap, "k2", 50L, 60L)
    assert(total === 2)
    assert(selected.size === 1 && selected.head.stats.contains("k"))
    assert(t.readBetween("k2", 50L, 60L).count() === 0)
    // a range inside the pre-rename file's values still returns its rows
    assert(t.readBetween("k2", 3L, 5L).select("k2").collect().map(_.getLong(0)).sorted
      === Array(3L, 4L, 5L))
  }

  test("pruning never drops rows: readBetween equals brute-force filter on random ranges") {
    val t = kvTable("statsprune-rand-")
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val a = rnd.nextLong(45) - 2
      val b = a + rnd.nextLong(20)
      val pruned = t.readBetween("k", a, b).select("k").collect().map(_.getLong(0)).sorted
      val brute = t.readLatest().filter(col("k") >= a && col("k") <= b)
        .select("k").collect().map(_.getLong(0)).sorted
      assert(pruned === brute, s"range [$a,$b]")
    }
  }
}
