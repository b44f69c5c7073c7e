package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dml.Dml
import graft.gen.Synthesize
import graft.maintenance.Maintenance

/** Incremental append scans (CDC consumption), rollback, and tag refs. */
class RefsAndIncrementalSpec extends SparkSpec {

  import spark.implicits._

  private def newSalesTable(): GraftTable = {
    val dir = scratchDir("refs-")
    val t = GraftTable.create(spark, dir, graft.model.Schemas.salesEvents)
    t.append(Synthesize.salesEvents8(spark).filter(col("event_id") <= 4))
    t
  }

  private def slice(lo: Int, hi: Int) =
    Synthesize.salesEvents8(spark).filter(col("event_id") > lo && col("event_id") <= hi)

  test("readIncremental returns exactly the rows appended in range") {
    val t = newSalesTable()
    val from = t.latest.snapshotId
    t.append(slice(4, 6))
    t.append(slice(6, 8))
    val inc = t.readIncremental(from, t.latest.snapshotId)
      .select("event_id").as[Long].collect().sorted
    assert(inc === Array(5L, 6L, 7L, 8L))
  }

  test("a compaction inside the range is skipped, not double-counted") {
    val t = newSalesTable()
    val from = t.latest.snapshotId
    t.append(slice(4, 5))
    t.append(slice(5, 6))
    assert(Maintenance.rewriteDataFiles(t, minInputFiles = 2).isDefined)
    t.append(slice(6, 7))
    val inc = t.readIncremental(from, t.latest.snapshotId)
      .select("event_id").as[Long].collect().sorted
    assert(inc === Array(5L, 6L, 7L))
  }

  test("schema evolution inside the range reads appended rows at target schema") {
    val t = newSalesTable()
    val from = t.latest.snapshotId
    t.append(slice(4, 6))
    t.renameColumn("sku", "product_sku")
    t.append(slice(6, 8).withColumnRenamed("sku", "product_sku"))
    val inc = t.readIncremental(from, t.latest.snapshotId)
    assert(inc.columns.contains("product_sku"))
    assert(inc.select("event_id").as[Long].collect().sorted === Array(5L, 6L, 7L, 8L))
  }

  test("a content-changing commit in range raises") {
    val t = newSalesTable()
    val from = t.latest.snapshotId
    t.append(slice(4, 6))
    Dml.delete(t, col("event_id") === 5)
    val e = intercept[IllegalArgumentException] {
      t.readIncremental(from, t.latest.snapshotId)
    }
    assert(e.getMessage.contains("content-changing"))
  }

  test("rollback restores the target state as a new linear commit") {
    val t = newSalesTable()
    val good = t.latest.snapshotId
    Dml.delete(t, col("event_id") <= 2)
    assert(t.readLatest().count() === 2)
    val rb = t.rollbackTo(good)
    assert(rb.operation === "rollback")
    assert(rb.parentId.contains(good + 1)) // linear: parent is the bad commit
    assert(t.readLatest().count() === 4)
    // the bad commit remains time-travelable
    assert(t.readVersionAsOf(good + 1).count() === 2)
  }

  test("rollback across schema evolution restores the old schema") {
    val t = newSalesTable()
    val good = t.latest.snapshotId
    t.renameColumn("sku", "product_sku")
    t.rollbackTo(good)
    assert(t.schema.fieldNames.contains("sku"))
    assert(t.readLatest().select("sku").count() === 4)
  }

  test("tags pin snapshots through expiry; deleteTag unpins") {
    val t = newSalesTable()
    t.createTag("v1", t.latest.snapshotId)
    t.append(slice(4, 8))
    t.append(slice(4, 4)) // empty append just to advance history
    Maintenance.expireSnapshots(t, retainLast = 1)
    // tagged snapshot survived with its files
    assert(t.readTag("v1").count() === 4)
    assert(t.readLatest().count() === 8)
    // duplicate tag name is an error, not a silent move
    intercept[IllegalArgumentException] { t.createTag("v1", t.latest.snapshotId) }
    assert(t.deleteTag("v1"))
    assert(t.tags.isEmpty)
    // now expirable: next expiry drops it
    Maintenance.expireSnapshots(t, retainLast = 1)
    intercept[IllegalArgumentException] { t.readTag("v1") }
  }

  test("readChangelog emits inserts and MOR deletes with commit ids") {
    val t = newSalesTable() // events 1..4, snapshot 2
    val from = t.latest.snapshotId
    t.append(slice(4, 6)) // +5, 6 at snapshot 3
    Dml.deleteMorKeys(t, Seq(2L, 5L).toDF("event_id")) // snapshot 4
    val log = t.readChangelog(from, t.latest.snapshotId)
      .select("event_id", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, Long)].collect().sortBy(r => (r._3, r._2, r._1))
    assert(log === Array(
      (5L, "insert", from + 1), (6L, "insert", from + 1),
      (2L, "delete", from + 2), (5L, "delete", from + 2)))
  }

  test("readChangelog renders an upsert as delete-of-preimage plus insert") {
    val t = newSalesTable()
    val from = t.latest.snapshotId
    val src = Synthesize.salesEvents8(spark).filter(col("event_id").isin(1, 2))
      .withColumn("qty", col("qty") + 100)
      .unionByName(Synthesize.salesEvents8(spark)
        .filter(col("event_id") === 3).withColumn("event_id", lit(99L)))
    Dml.upsertMor(t, src, Seq("event_id"))
    val log = t.readChangelog(from, t.latest.snapshotId)
      .select("event_id", "qty", "_change_type")
      .as[(Long, Int, String)].collect().sortBy(r => (r._3, r._1))
    // deletes carry the PRE-image qty; inserts the new values; 99 is new
    assert(log.filter(_._3 == "delete").map(r => (r._1, r._2)).toSeq ===
      Seq((1L, 3), (2L, 5)))
    assert(log.filter(_._3 == "insert").map(r => (r._1, r._2)).toSeq ===
      Seq((1L, 103), (2L, 105), (99L, 2)))
  }

  test("readChangelog raises on copy-on-write commits and skips maintenance") {
    val t = newSalesTable()
    val from = t.latest.snapshotId
    t.append(slice(4, 6))
    t.append(slice(6, 8))
    assert(Maintenance.rewriteDataFiles(t, minInputFiles = 2).isDefined)
    val log = t.readChangelog(from, t.latest.snapshotId)
    assert(log.filter(col("_change_type") === "insert").count() === 4)
    assert(log.filter(col("_change_type") === "delete").count() === 0)
    Dml.delete(t, col("event_id") === 1) // COW: no row-level diff recorded
    val e = intercept[IllegalArgumentException] {
      t.readChangelog(from, t.latest.snapshotId)
    }
    assert(e.getMessage.contains("row-level"))
  }

  test("change reads refuse gapped ranges left by tag-aware expiry") {
    val t = newSalesTable()
    t.createTag("pin", t.latest.snapshotId)
    t.append(slice(4, 5)) // will be expired
    t.append(slice(5, 6))
    t.append(slice(6, 7))
    Maintenance.expireSnapshots(t, retainLast = 2)
    // live log: pinned snapshot 2 + last two; snapshot 3 is gone
    val pinned = t.tags("pin")
    val e = intercept[IllegalArgumentException] {
      t.readIncremental(pinned, t.latest.snapshotId)
    }
    assert(e.getMessage.contains("expired"))
    intercept[IllegalArgumentException] {
      t.readChangelog(pinned, t.latest.snapshotId)
    }
  }

  test("partitions()/refs()/history() metadata tables reflect table state") {
    import org.apache.spark.sql.Row
    val dir = scratchDir("meta-")
    val df = Synthesize.salesEvents8(spark)
      .withColumn("bucket", (col("event_id") % 2).cast("string"))
    val t = GraftTable.create(spark, dir, df.schema, partitionCols = Seq("bucket"))
    t.append(df.filter(col("event_id") <= 4))
    t.append(df.filter(col("event_id") > 4))
    val parts = t.partitions().collect()
    assert(parts.map(_.getString(0)).toSeq === Seq("bucket=0", "bucket=1"))
    assert(parts.map(_.getLong(2)).sum === 8L) // total_rows from metadata
    assert(parts.forall(_.getLong(1) >= 2L))   // files from both commits
    t.createTag("v1", t.latest.snapshotId)
    t.createBranch("b")
    val refRows = t.refs().collect()
    assert(refRows.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("v1", "tag"), ("b", "branch")))
    val hist = t.history().orderBy("snapshot_id").collect()
    assert(hist.map(_.getString(3)).toSeq === Seq("create", "append", "append"))
    t.dropBranch("b")
    assert(t.refs().filter(col("type") === "branch").count() === 0)
  }

  test("tag names are validated and listed") {
    val t = newSalesTable()
    intercept[IllegalArgumentException] { t.createTag("bad/name", t.latest.snapshotId) }
    intercept[IllegalArgumentException] { t.createTag("x", 999L) }
    t.createTag("release-1.0", t.latest.snapshotId)
    assert(t.tags === Map("release-1.0" -> t.latest.snapshotId))
  }

  test("RETAIN-aged tags drop at expiry and release their snapshots") {
    val t = newSalesTable()
    var now = 1700000000000L
    t.clock = () => now
    val v2 = t.append(slice(4, 6)).snapshotId
    // short-lived audit tag (2-day retention) on v2; permanent tag on head
    t.createTag("nightly", v2, Some(2L * 24 * 3600 * 1000))
    val v3 = t.append(slice(6, 8)).snapshotId
    t.createTag("release", v3)
    t.append(slice(0, 0)) // advance head so v2/v3 are expiry candidates
    val v4 = t.latest.snapshotId

    // inside the window: expiry must keep BOTH tagged snapshots
    now += 1L * 24 * 3600 * 1000
    graft.maintenance.Maintenance.expireSnapshots(t, retainLast = 1)
    assert(t.tags.keySet == Set("nightly", "release"))
    assert(t.snapshotsList.map(_.snapshotId).toSet.intersect(Set(v2, v3)) == Set(v2, v3))

    // past the window: the nightly tag ages out IN the expiry pass and its
    // snapshot expires with it; the permanent tag still pins v3
    now += 2L * 24 * 3600 * 1000
    graft.maintenance.Maintenance.expireSnapshots(t, retainLast = 1)
    assert(t.tags.keySet == Set("release"))
    val left = t.snapshotsList.map(_.snapshotId).toSet
    assert(!left.contains(v2) && left.contains(v3) && left.contains(v4))

    // the SQL RETAIN clause routes to the same retention
    val eng = new graft.plan.SparkSqlEngine(spark)
    eng.registerGraftTable("refsql", t)
    eng.execute("ALTER TABLE refsql CREATE TAG tmp RETAIN 7 DAYS")
    assert(t.tags.contains("tmp"))
    assert(t.dropExpiredTags(now + 8L * 24 * 3600 * 1000) == Seq("tmp"))
    assert(!t.tags.contains("tmp"))
  }

  test("RETAIN-aged tags drop even when no snapshot can expire") {
    // Iceberg removes aged-out refs unconditionally — on a table with too
    // few snapshots for the retain-last floor, expiry must still age tags
    // instead of short-circuiting before the ref pass
    val t = newSalesTable()
    var now = 1700000000000L
    t.clock = () => now
    t.createTag("shortlived", t.latest.snapshotId, Some(1L * 24 * 3600 * 1000))
    val nSnaps = t.snapshotsList.size
    now += 2L * 24 * 3600 * 1000
    val expired = graft.maintenance.Maintenance.expireSnapshots(
      t, retainLast = nSnaps + 5)
    assert(expired == 0, "no snapshot may expire under the floor")
    assert(!t.tags.contains("shortlived"),
      "an aged-out tag must drop even when expiry itself is a no-op")
  }
}
