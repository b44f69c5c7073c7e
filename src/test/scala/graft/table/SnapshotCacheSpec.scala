package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The snapshot-log load cache (round 16): repeat loads of an unchanged log
  * must answer from the parsed cache (one listStatus, zero doc reads), and
  * every mutation route — same-JVM commit, manifest consolidation, expiry's
  * replaceAll, and an out-of-band writer the invalidate hooks never see —
  * must yield a fresh parse with the right content. Metadata planning on a
  * 100 TB table is a driver hot path: every table operation loads the log
  * several times, and without the cache each load re-reads and re-parses
  * every snapshot doc.
  */
class SnapshotCacheSpec extends SparkSpec {

  private def conf = new Configuration()

  private def parses(): Long = SnapshotLog.uncachedParses.get()

  test("repeat loads of an unchanged log are cache hits") {
    import spark.implicits._
    val dir = scratchDir("snapcache-hit")
    val df = (1L to 100L).toDF("v")
    val t = GraftTable.create(spark, dir, df.schema)
    t.append(df)
    t.append(df)

    SnapshotLog.load(conf, dir) // warm (commit invalidated eagerly)
    val before = parses()
    val a = SnapshotLog.load(conf, dir)
    val b = SnapshotLog.load(conf, dir)
    assert(parses() === before, "unchanged log must not be re-parsed")
    assert(a.map(_.snapshotId) === b.map(_.snapshotId))
    assert(a.size === 3) // create + 2 appends
  }

  test("a same-JVM commit invalidates; the next load sees the new snapshot") {
    import spark.implicits._
    val dir = scratchDir("snapcache-commit")
    val df = (1L to 10L).toDF("v")
    val t = GraftTable.create(spark, dir, df.schema)
    t.append(df)
    val v1 = SnapshotLog.load(conf, dir)
    t.append(df)
    val v2 = SnapshotLog.load(conf, dir)
    assert(v2.size === v1.size + 1)
    assert(v2.last.snapshotId > v1.last.snapshotId)
  }

  test("an out-of-band log write is caught by the listing signature") {
    import spark.implicits._
    val dir = scratchDir("snapcache-external")
    val df = (1L to 10L).toDF("v")
    val t = GraftTable.create(spark, dir, df.schema)
    t.append(df)
    val v1 = SnapshotLog.load(conf, dir)
    SnapshotLog.load(conf, dir) // ensure the cached entry is in place

    // simulate an external committer: publish a snapshot doc directly,
    // bypassing every same-JVM invalidate hook
    val head = v1.last
    val next = head.copy(snapshotId = head.snapshotId + 1,
      parentId = Some(head.snapshotId), operation = "append")
    val f = SnapshotLog.fs(conf, dir)
    assert(SnapshotLog.publishAtomicAt(f,
      new org.apache.hadoop.fs.Path(SnapshotLog.logPath(dir),
        f"v${next.snapshotId}%08d.json"),
      org.json4s.jackson.Serialization.write(
        SnapshotLog.toDoc(next, None))(SnapshotLog.formats)))

    val v2 = SnapshotLog.load(conf, dir)
    assert(v2.size === v1.size + 1, "signature change must bust the cache")
    assert(v2.last.snapshotId === next.snapshotId)
  }

  test("consolidation and expiry invalidate; loads stay correct") {
    import spark.implicits._
    val dir = scratchDir("snapcache-maint")
    val df = (1L to 10L).toDF("v")
    val t = GraftTable.create(spark, dir, df.schema)
    (1 to 5).foreach(_ => t.append(df))
    SnapshotLog.load(conf, dir)
    assert(SnapshotLog.rewriteManifests(conf, dir) === 6)
    val afterManifest = SnapshotLog.load(conf, dir)
    assert(afterManifest.size === 6)

    // replaceAll (expiry's primitive): drop all but the last two
    assert(SnapshotLog.replaceAll(conf, dir, afterManifest.takeRight(2)))
    val afterExpiry = SnapshotLog.load(conf, dir)
    assert(afterExpiry.map(_.snapshotId) ===
      afterManifest.takeRight(2).map(_.snapshotId))

    // and the post-maintenance state is itself cache-served
    val before = parses()
    SnapshotLog.load(conf, dir)
    assert(parses() === before)
  }
}
