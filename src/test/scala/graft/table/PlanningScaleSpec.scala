package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Driver-side planning at 100× file counts (VERDICT r12 #5): the O(files)
  * driver planning model (`planBetween`, snapshot-log commit/load, manifest
  * consolidation, expiry) is the single-point risk of a 100× scale-up — at
  * 100 TB / 128 MB target files a table holds ~10⁵-10⁶ file entries and ALL
  * of them ride through driver memory on every plan. This spec synthesizes
  * a snapshot log with 100k FileEntry rows (metadata only — no data files
  * are written or read) and bounds the wall-time and heap of each planning
  * operation, plus an empirical linearity check (100k vs 10k cost ratio).
  *
  * The bounds are loud-failure envelopes (~10× the times measured at
  * local[32]: planBetween ~0.1 s, log round-trip ~4 s, manifest rewrite
  * ~2 s, expiry ~1 s), not expectations — their role is to fail the build
  * if planning silently goes quadratic or starts OOMing at 10⁵ files.
  */
class PlanningScaleSpec extends SparkSpec {

  private val FILES = 100000

  /** Synthetic file entries: file i covers ids [i*1000, i*1000+999] with
    * full min/max/null stats — the shape a real 128 MB-target write leaves.
    */
  private def syntheticFiles(n: Int): List[FileEntry] =
    (0 until n).map { i =>
      FileEntry(
        path = f"part-$i%06d.parquet",
        partitionValues = Map.empty,
        rowCount = 1000L,
        sizeBytes = 128L * 1024 * 1024,
        writtenAt = 0L,
        stats = Map("id" -> List((i * 1000L).toString, (i * 1000L + 999L).toString, "0")))
    }.toList

  private def mkLog(name: String, n: Int): GraftTable = {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "s")
    val t = GraftTable.create(spark, scratchDir(name), df.schema)
    t.append(df)
    val base = t.latest
    val big = base.copy(snapshotId = base.snapshotId + 1,
      parentId = Some(base.snapshotId), operation = "append",
      files = syntheticFiles(n),
      summary = Map("added-files" -> n.toString))
    assert(SnapshotLog.commit(spark.sessionState.newHadoopConf(),
      t.tableDir, big, parent = Some(base)))
    t
  }

  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  test(s"planBetween over $FILES file entries: bounded time, exact pruning, linear scaling") {
    val t = mkLog("plan-100k", FILES)
    val snap = t.latest
    assert(snap.files.size === FILES)
    // warm-up (JIT) then measure
    t.planBetween(snap, "id", 0L, 999L)
    val sec = timeSec {
      val (kept, total) = t.planBetween(snap, "id", 5000000L, 5999999L)
      assert(total === FILES)
      // ids 5.0M..5.999999M ⇒ exactly files 5000..5999
      assert(kept.size === 1000, s"pruning kept ${kept.size} of $FILES files")
    }
    assert(sec < 2.0, f"planBetween at $FILES files took $sec%.2f s")
    // empirical complexity: 10× the files must cost well under 100× the time
    // (generous 30× allows constant overhead + GC noise on the small side)
    val t10 = mkLog("plan-10k", FILES / 10)
    t10.planBetween(t10.latest, "id", 0L, 999L)
    val sec10 = timeSec { t10.planBetween(t10.latest, "id", 500000L, 599999L) }
    assert(sec < math.max(sec10, 0.005) * 30,
      f"planBetween scaled superlinearly: $sec10%.4f s @10k vs $sec%.4f s @100k")
    info(f"planBetween: $sec10%.3f s @10k files, $sec%.3f s @100k files")
  }

  test(s"log commit/load, manifest rewrite, expiry at $FILES files: bounded and no OOM") {
    val rt = Runtime.getRuntime
    def usedMb: Long = { System.gc(); (rt.totalMemory() - rt.freeMemory()) / 1024 / 1024 }
    val memBefore = usedMb
    var t: GraftTable = null
    val commitLoadSec = timeSec {
      t = mkLog("plan-maint-100k", FILES)       // one 100k-entry commit...
      assert(t.latest.files.size === FILES)     // ...and a full log reload
    }
    assert(commitLoadSec < 40.0,
      f"100k-entry snapshot commit+load took $commitLoadSec%.1f s")
    // manifest consolidation serializes the full 100k-entry listing once
    val manifestSec = timeSec {
      SnapshotLog.rewriteManifests(spark.sessionState.newHadoopConf(), t.tableDir)
    }
    assert(manifestSec < 20.0, f"manifest rewrite took $manifestSec%.1f s")
    // expiry walks every snapshot's file list to find unreferenced paths
    val expireSec = timeSec {
      graft.maintenance.Maintenance.expireSnapshots(t, retainLast = 1)
    }
    assert(expireSec < 10.0, f"expiry over a 100k-file log took $expireSec%.1f s")
    assert(t.snapshotsList.size === 1)
    assert(t.latest.files.size === FILES)
    val memAfter = usedMb
    // 100k entries ≈ tens of MB in driver heap — loud bound at 2 GB so a
    // structural copy explosion (not the entries themselves) fails the build
    assert(memAfter - memBefore < 2048,
      s"driver heap grew by ${memAfter - memBefore} MB across 100k-file planning")
    info(f"commit+load $commitLoadSec%.2f s, manifest $manifestSec%.2f s, " +
      f"expire $expireSec%.2f s, heap +${memAfter - memBefore} MB")
  }
}
