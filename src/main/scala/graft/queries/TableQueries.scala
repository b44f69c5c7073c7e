package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.dml.Dml
import graft.gen.Synthesize
import graft.maintenance.Maintenance
import graft.table.GraftTable

/** Table-layer operators (create/append/DML/time-travel/maintenance) exposed
  * as driver-checkable queries: each entry builds a scratch `GraftTable` from
  * a deterministic slice of the testdata, applies the operation, and returns a
  * read-back whose expected value the DuckDB oracle derives from the SAME
  * source parquet — so the snapshot log, COW rewrite, and evolution replay are
  * all on the hash-checked path.
  */
object TableQueries {
  type Q = (SparkSession, String) => DataFrame

  private val ScratchRoot = "/root/repo/target/graft-scratch"

  /** Fresh scratch dir per query invocation (Verify and Bench both rebuild). */
  private def scratch(name: String): String = {
    val dir = new java.io.File(s"$ScratchRoot/$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (dir.exists()) rm(dir)
    dir.mkdirs()
    dir.toString
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  private def liSubset(s: SparkSession, dir: String, maxKey: Long): DataFrame =
    Tables.lineitem(s, dir).filter(col("l_orderkey") < maxKey)

  private def checksum(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("row_count"),
      dec(sum(dec(col("l_quantity")))).as("sum_qty"))

  val queries: Map[String, Q] = Map(
    // D1 — COW UPDATE: bump quantity on one returnflag, checksum read-back
    "t_cow_update" -> ((s, dir) => {
      val t = GraftTable.create(s, scratch("cow_update"), liSubset(s, dir, 1000).schema)
      t.append(liSubset(s, dir, 1000))
      Dml.update(t, col("l_returnflag") === "R",
        Map("l_quantity" -> (col("l_quantity") + 5.0)))
      checksum(t.readLatest())
    }),

    // D2 — COW DELETE: drop one returnflag, checksum read-back
    "t_cow_delete" -> ((s, dir) => {
      val t = GraftTable.create(s, scratch("cow_delete"), liSubset(s, dir, 1000).schema)
      t.append(liSubset(s, dir, 1000))
      Dml.delete(t, col("l_returnflag") === "R")
      checksum(t.readLatest())
    }),

    // D3/J1 — MERGE upsert: doubled-price source overlaps half the target
    "t_merge_upsert" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
      val t = GraftTable.create(s, scratch("merge_upsert"), base.schema)
      t.append(base.filter(col("o_orderkey") < 100))
      val source = base.filter(col("o_orderkey") >= 50 && col("o_orderkey") < 150)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      Dml.merge(t, source, "o_orderkey",
        Map("o_totalprice" -> col("src.o_totalprice")), insertNotMatched = true)
      t.readLatest().agg(count(lit(1)).as("row_count"),
        dec(sum(dec(col("o_totalprice")))).as("sum_price"))
    }),

    // T1 — VERSION AS OF: read the pre-delete snapshot
    "t_time_travel" -> ((s, dir) => {
      val t = GraftTable.create(s, scratch("time_travel"), liSubset(s, dir, 500).schema)
      t.append(liSubset(s, dir, 500))
      val baseline = t.latest.snapshotId
      Dml.delete(t, col("l_returnflag") === "R")
      checksum(t.readVersionAsOf(baseline))
    }),

    // S8 — snapshots() metadata after create → append → delete
    "t_snapshots_meta" -> ((s, dir) => {
      val t = GraftTable.create(s, scratch("snapshots_meta"), liSubset(s, dir, 500).schema)
      t.append(liSubset(s, dir, 500))
      Dml.delete(t, col("l_returnflag") === "R")
      t.snapshots().select("snapshot_id", "operation", "total_rows").orderBy("snapshot_id")
    }),

    // D4-D6 — evolution chain on the 8-row interop dataset, evolved read-back
    "t_schema_evolution" -> ((s, _) => {
      val t = GraftTable.create(s, scratch("schema_evolution"), graft.model.Schemas.salesEvents)
      t.append(Synthesize.salesEvents8(s))
      t.addColumn("channel", "string", "web")
      t.renameColumn("sku", "product_sku")
      t.widenColumn("qty", "bigint")
      t.readLatest().select("event_id", "product_sku", "qty", "channel").orderBy("event_id")
    }),

    // D7 — DESCRIBE TABLE after evolution
    "t_describe" -> ((s, _) => {
      val t = GraftTable.create(s, scratch("describe"), graft.model.Schemas.salesEvents)
      t.append(Synthesize.salesEvents8(s))
      t.addColumn("channel", "string", "web")
      t.renameColumn("sku", "product_sku")
      t.widenColumn("qty", "bigint")
      GraftTable.describe(s, t).orderBy("col_name")
    }),

    // S5/P3 — hive-partitioned table, partition-pruned read-back
    "t_partitioned_prune" -> ((s, dir) => {
      val data = liSubset(s, dir, 1000)
      val t = GraftTable.create(s, scratch("partitioned"), data.schema,
        partitionCols = Seq("l_returnflag"))
      t.append(data)
      t.readLatest().filter(col("l_returnflag") === "A")
        .agg(count(lit(1)).as("row_count"))
    }),

    // M1 — compaction preserves data, collapses to one file
    "t_compaction" -> ((s, dir) => {
      val data = liSubset(s, dir, 400)
      val t = GraftTable.create(s, scratch("compaction"), data.schema)
      (0 until 4).foreach(i =>
        t.append(data.filter(col("l_orderkey") % 4 === i)))
      Maintenance.rewriteDataFiles(t, targetFileSizeBytes = 1L << 30)
      t.readLatest().agg(count(lit(1)).as("row_count"),
        dec(sum(dec(col("l_quantity")))).as("sum_qty"))
        .withColumn("n_files", lit(t.latest.files.size.toLong))
    }),

    // M2+M3 — manifest rewrite then expiry retain-last-2; log + data both right
    "t_expire_snapshots" -> ((s, dir) => {
      val t = GraftTable.create(s, scratch("expire"), liSubset(s, dir, 500).schema)
      t.append(liSubset(s, dir, 500))
      Dml.delete(t, col("l_returnflag") === "R")
      Maintenance.rewriteManifests(t)
      Maintenance.expireSnapshots(t, retainLast = 2)
      checksum(t.readLatest())
        .withColumn("n_snapshots", lit(t.snapshotsList.size.toLong))
    }),

    // M4 — orphan removal leaves live data intact
    "t_orphan_cleanup" -> ((s, dir) => {
      val t = GraftTable.create(s, scratch("orphan"), liSubset(s, dir, 500).schema)
      t.append(liSubset(s, dir, 500))
      val orphan = new java.io.File(s"${t.tableDir}/data/orphan.parquet")
      java.nio.file.Files.writeString(orphan.toPath, "junk")
      val removed = Maintenance.removeOrphanFiles(t)
      checksum(t.readLatest())
        .withColumn("n_orphans_removed",
          lit(removed.count(_.contains("orphan.parquet")).toLong))
    })
  )

  val oracle: Map[String, String] = Map(
    "t_cow_update" ->
      """SELECT COUNT(*) AS row_count,
           CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity + 5.0 ELSE l_quantity END AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty
         FROM lineitem WHERE l_orderkey < 1000""",
    "t_cow_delete" ->
      """SELECT COUNT(*) AS row_count,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty
         FROM lineitem WHERE l_orderkey < 1000 AND l_returnflag <> 'R'""",
    "t_merge_upsert" ->
      """SELECT COUNT(*) AS row_count,
           CAST(SUM(CAST(CASE WHEN o_orderkey >= 50 THEN o_totalprice * 2 ELSE o_totalprice END AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
         FROM orders WHERE o_orderkey < 150""",
    "t_time_travel" ->
      """SELECT COUNT(*) AS row_count,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty
         FROM lineitem WHERE l_orderkey < 500""",
    "t_snapshots_meta" ->
      """SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS snapshot_id, 'create' AS operation, CAST(0 AS BIGINT) AS total_rows
           UNION ALL
           SELECT 2, 'append', (SELECT COUNT(*) FROM lineitem WHERE l_orderkey < 500)
           UNION ALL
           SELECT 3, 'delete', (SELECT COUNT(*) FROM lineitem WHERE l_orderkey < 500 AND l_returnflag <> 'R'))
         ORDER BY snapshot_id""",
    "t_schema_evolution" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), 'sku-0001', CAST(3 AS BIGINT), 'web'),
           (2, 'sku-0002', 5, 'web'),
           (3, 'sku-0003', 2, 'web'),
           (4, 'sku-0004', 8, 'web'),
           (5, 'sku-0005', 1, 'web'),
           (6, 'sku-0002', 10, 'web'),
           (7, 'sku-0003', 4, 'web'),
           (8, 'sku-0004', 6, 'web'))
         AS t(event_id, product_sku, qty, channel) ORDER BY event_id""",
    "t_describe" ->
      """SELECT * FROM (VALUES
           ('channel', 'string'), ('country', 'string'), ('ds', 'date'),
           ('event_id', 'bigint'), ('event_ts', 'timestamp'),
           ('price', 'decimal(18,2)'), ('product_sku', 'string'),
           ('qty', 'bigint'), ('tenant_id', 'int'))
         AS t(col_name, data_type) ORDER BY col_name""",
    "t_partitioned_prune" ->
      "SELECT COUNT(*) AS row_count FROM lineitem WHERE l_orderkey < 1000 AND l_returnflag = 'A'",
    "t_compaction" ->
      """SELECT COUNT(*) AS row_count,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
           CAST(1 AS BIGINT) AS n_files
         FROM lineitem WHERE l_orderkey < 400""",
    "t_expire_snapshots" ->
      """SELECT COUNT(*) AS row_count,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
           CAST(2 AS BIGINT) AS n_snapshots
         FROM lineitem WHERE l_orderkey < 500 AND l_returnflag <> 'R'""",
    "t_orphan_cleanup" ->
      """SELECT COUNT(*) AS row_count,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
           CAST(1 AS BIGINT) AS n_orphans_removed
         FROM lineitem WHERE l_orderkey < 500"""
  )
}
