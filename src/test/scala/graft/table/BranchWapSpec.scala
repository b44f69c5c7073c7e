package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.gen.Synthesize
import graft.maintenance.Maintenance

/** Branch refs and the write-audit-publish cycle: staged commits are
  * invisible to main readers, publish is a validated metadata-only
  * fast-forward, staged files survive maintenance until the branch drops.
  */
class BranchWapSpec extends SparkSpec {

  private def newSalesTable(): GraftTable = {
    val dir = scratchDir("wap-")
    val t = GraftTable.create(spark, dir, graft.model.Schemas.salesEvents)
    t.append(Synthesize.salesEvents8(spark).filter(col("event_id") <= 4))
    t
  }

  private def slice(lo: Int, hi: Int) =
    Synthesize.salesEvents8(spark).filter(col("event_id") > lo && col("event_id") <= hi)

  test("write-audit-publish: staged rows invisible until publish, then one commit") {
    val t = newSalesTable()
    t.createBranch("ingest")
    t.appendToBranch("ingest", slice(4, 6))
    t.appendToBranch("ingest", slice(6, 8))
    // audit: branch sees staged state, main does not
    assert(t.readBranch("ingest").count() === 8)
    assert(t.readLatest().count() === 4)
    val snapsBefore = t.snapshotsList.size
    val pub = t.publishBranch("ingest")
    assert(pub.operation === "publish-branch")
    assert(t.snapshotsList.size === snapsBefore + 1) // ONE main commit
    assert(t.readLatest().count() === 8)
    assert(t.branches.isEmpty) // ref dropped after publish
  }

  test("publish raises when main advanced past the branch base (stale audit)") {
    val t = newSalesTable()
    t.createBranch("b")
    t.appendToBranch("b", slice(4, 6))
    t.append(slice(7, 8)) // main moves on
    intercept[java.util.ConcurrentModificationException] {
      t.publishBranch("b")
    }
    // branch still droppable; main unaffected
    assert(t.readLatest().count() === 5)
    assert(t.dropBranch("b"))
  }

  test("maintenance spares staged branch files; dropBranch orphans them") {
    val t = newSalesTable()
    t.createBranch("b")
    t.appendToBranch("b", slice(4, 8))
    assert(Maintenance.removeOrphanFiles(t, Long.MaxValue).isEmpty) // staged files are live
    assert(t.readBranch("b").count() === 8)
    t.dropBranch("b")
    val orphans = Maintenance.removeOrphanFiles(t, Long.MaxValue)
    assert(orphans.nonEmpty) // the staged files, now unreferenced
    assert(t.readLatest().count() === 4)
  }

  test("branch appends survive expiry of unrelated main history") {
    val t = newSalesTable()
    t.append(slice(4, 5))
    t.createBranch("b")
    t.appendToBranch("b", slice(5, 6))
    t.append(slice(6, 7))
    t.append(slice(7, 8))
    Maintenance.expireSnapshots(t, retainLast = 2)
    // base was expired -> publish must refuse (stale), but staged DATA is intact
    assert(t.readBranch("b").count() === 6)
    intercept[java.util.ConcurrentModificationException] { t.publishBranch("b") }
  }

  test("branch names validate; duplicate create raises; schema drift rejected") {
    val t = newSalesTable()
    intercept[IllegalArgumentException] { t.createBranch("bad/name") }
    t.createBranch("b")
    intercept[IllegalArgumentException] { t.createBranch("b") }
    intercept[IllegalArgumentException] {
      t.appendToBranch("b", slice(4, 6).drop("qty"))
    }
  }

  test("racing branch appends lose no staged rows (CAS head, losers retry)") {
    import spark.implicits._
    val t = GraftTable.create(spark, scratchDir("wap-race"),
      Seq((0L, 0L)).toDF("k", "v").schema)
    t.append(Seq((-1L, 0L)).toDF("k", "v"))
    t.createBranch("stage")
    val threads = 6
    val perThread = 3
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = (0 until threads).map { i =>
      new Thread(() => {
        try (0 until perThread).foreach { j =>
          val base = (i * perThread + j) * 10L
          t.appendToBranch("stage",
            (base until base + 10L).map(k => (k, k * 2)).toDF("k", "v"))
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    pool.foreach(_.start()); pool.foreach(_.join())
    assert(errs.isEmpty, s"branch append raced to failure: ${errs.peek()}")
    // every thread's every batch staged exactly once
    val staged = t.readBranch("stage").filter(col("k") >= 0)
    assert(staged.count() === threads * perThread * 10L)
    assert(staged.select("k").distinct().count() === threads * perThread * 10L,
      "a racing branch append dropped or duplicated a batch")
    // main untouched; publish lands everything in one commit
    assert(t.readLatest().count() === 1)
    t.publishBranch("stage")
    assert(t.readLatest().count() === threads * perThread * 10L + 1)
  }
}
