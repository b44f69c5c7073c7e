package graft.maintenance

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dml.Dml
import graft.table.GraftTable

/** Policy-driven single-pass maintenance orchestration. */
class MaintainTableSpec extends SparkSpec {

  import spark.implicits._

  private def busyTable(): GraftTable = {
    val t = GraftTable.create(spark, scratchDir("maintain-"),
      Seq((1L, "a")).toDF("k", "v").schema)
    (0 until 4).foreach { i =>
      t.append((i * 10 until i * 10 + 10).map(j => (j.toLong, s"v$j")).toDF("k", "v")
        .coalesce(1))
    }
    (0 until 3).foreach(i => Dml.deleteMorKeys(t, Seq((i * 10).toLong).toDF("k")))
    t
  }

  test("a busy table gets every procedure its thresholds call for") {
    val t = busyTable()
    val before = t.readLatest().orderBy("k").collect()
    val report = Maintenance.maintainTable(t, MaintenancePolicy(
      maxDeleteFiles = 2, maxSnapshotDocs = 3, retainLast = 2))
    assert(report.materializedDeletes) // 3 delete files > 2
    assert(report.compacted)           // 4+ small files per (sole) partition
    assert(report.manifestsConsolidated > 0)
    assert(report.snapshotsExpired > 0)
    assert(t.latest.deletes.isEmpty)
    assert(t.readLatest().orderBy("k").collect() === before) // content preserved
    assert(t.readLatest().count() === 37) // 40 − 3 MOR-deleted
  }

  test("an idle table is a metadata-only no-op pass") {
    val t = GraftTable.create(spark, scratchDir("maintain-idle-"),
      Seq((1L, "a")).toDF("k", "v").schema)
    t.append(Seq((1L, "x")).toDF("k", "v").coalesce(1))
    val snapsBefore = t.snapshotsList.size
    val report = Maintenance.maintainTable(t) // defaults: nothing triggers
    assert(report === MaintenanceReport(
      materializedDeletes = false, compacted = false,
      manifestsConsolidated = 0, snapshotsExpired = 0))
    assert(t.snapshotsList.size === snapsBefore)
  }

  test("delete materialization is threshold-gated") {
    val t = busyTable()
    val report = Maintenance.maintainTable(t, MaintenancePolicy(
      maxDeleteFiles = 10, minInputFiles = 100)) // neither triggers
    assert(!report.materializedDeletes && !report.compacted)
    assert(t.latest.deletes.size === 3) // untouched
  }
}
