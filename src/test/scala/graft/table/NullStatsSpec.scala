package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Null-count statistics (the Iceberg `null_value_counts` analog): IS NULL /
  * IS NOT NULL file pruning, metadata-only COUNT(col), all-null files
  * dropping out of range scans and MIN/MAX, and conservative behavior for
  * legacy 2-element stats docs.
  */
class NullStatsSpec extends SparkSpec {

  import spark.implicits._

  private def mk(name: String): GraftTable = {
    // three files: all-non-null, all-null, mixed (2 of 5 null)
    val nonNull = (1 to 10).map(i => (i.toLong, Some(i.toLong * 10)))
    val allNull = (11 to 20).map(i => (i.toLong, Option.empty[Long]))
    val mixed = (21 to 25).map(i =>
      (i.toLong, if (i % 2 == 0) Some(i.toLong * 10) else None))
    val df = (nonNull ++ allNull ++ mixed).toDF("k", "v")
    val t = GraftTable.create(spark, scratchDir(name), df.schema)
    t.append(df.filter(col("k") <= 10).coalesce(1))
    t.append(df.filter(col("k") > 10 && col("k") <= 20).coalesce(1))
    t.append(df.filter(col("k") > 20).coalesce(1))
    t
  }

  test("IS NULL skips zero-null files; IS NOT NULL skips all-null files") {
    val t = mk("nullstats")
    val (selNull, total) = t.planNullability(t.latest, "v", isNull = true)
    assert(total == 3 && selNull.size == 2, "the zero-null file cannot match IS NULL")
    val (selNotNull, _) = t.planNullability(t.latest, "v", isNull = false)
    assert(selNotNull.size == 2, "the all-null file cannot match IS NOT NULL")

    assert(t.readWhereNull("v", isNull = true).count() == 13L) // 10 + 3
    assert(t.readWhereNull("v", isNull = false).count() == 12L) // 10 + 2
  }

  test("metadata COUNT(col) is exact; falls back on deletes and missing stats") {
    val t = mk("nullcount")
    assert(t.countNonNullFromMetadata("v").contains(12L))
    assert(t.countNonNullFromMetadata("k").contains(25L))
    assert(t.countRowsFromMetadata().contains(25L))
    // a column added after files were written: no guessing about defaults
    t.addColumn("extra", "bigint")
    assert(t.countNonNullFromMetadata("extra").isEmpty)
    assert(t.countNonNullFromMetadata("v").contains(12L)) // untouched column still answers
    // MOR delete: metadata can no longer answer
    graft.dml.Dml.deleteMorKeys(t, Seq(1L).toDF("k"))
    assert(t.countNonNullFromMetadata("v").isEmpty)
  }

  test("all-null files drop out of range scans and MIN/MAX instead of forcing a scan") {
    val t = mk("nullrange")
    // range scan on v: the all-null file holds nothing in any range
    val (sel, total) = t.planBetween(t.latest, "v", 10L, 250L)
    assert(total == 3 && sel.size == 2, "all-null file pruned from range scan")
    assert(t.readBetween("v", 10L, 250L).count() == 12L)
    // min/max: all-null file contributes nothing, other files answer exactly
    assert(t.minMaxFromMetadata("v").contains((10L, 240L)))
  }

  test("NaN-poisoned float chunk is NOT treated as all-null (IS NOT NULL keeps it)") {
    // parquet drops min/max for a NaN-containing double chunk but still
    // records numNulls=0 — the same [nullCount] stats shape as an all-null
    // file. Inferring all-null from the shape would silently drop the NaN
    // rows from IS NOT NULL reads; allNull therefore requires nc == rowCount.
    val df = Seq((1L, Double.NaN), (2L, Double.NaN)).toDF("k", "d")
    val t = GraftTable.create(spark, scratchDir("nullnan"), df.schema)
    t.append(df.coalesce(1))
    val (selNotNull, total) = t.planNullability(t.latest, "d", isNull = false)
    assert(total == 1 && selNotNull.size == 1, "NaN rows are non-null; file must stay")
    assert(t.readWhereNull("d", isNull = false).count() == 2L)
    val (selNull, _) = t.planNullability(t.latest, "d", isNull = true)
    assert(selNull.isEmpty, "numNulls=0 is still usable: no row IS NULL")
    assert(t.readWhereNull("d", isNull = true).count() == 0L)
    // metadata COUNT counts NaN as non-null, matching SQL
    assert(t.countNonNullFromMetadata("d").contains(2L))
    // min/max cannot answer (no bounds, not all-null) — scan fallback
    assert(t.minMaxFromMetadata("d").isEmpty)
  }

  test("legacy 2-element stats entries stay conservative (no null info)") {
    val t = mk("nulllegacy")
    val snap = t.latest
    // strip null counts, simulating a pre-format doc
    val legacy = snap.copy(files = snap.files.map(f => f.copy(stats = f.stats.flatMap {
      case (k, mn :: mx :: _) => Some(k -> List(mn, mx))
      case _ => None // all-null entries had no bounds at all in the old format
    })))
    val (selNull, _) = t.planNullability(legacy, "v", isNull = true)
    assert(selNull.size == 3, "without null counts nothing can be excluded")
    val (selRange, _) = t.planBetween(legacy, "v", 10L, 250L)
    assert(selRange.size == 3, "legacy all-null file (no stats) is kept")
  }
}
