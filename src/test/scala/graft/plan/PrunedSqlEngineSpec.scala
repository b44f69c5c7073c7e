package graft.plan

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.GraftTable

/** SQL-path stats pruning (`SparkSqlEngine.registerGraftTable`): a range
  * predicate in a plain SQL statement must shrink the scan's file list via
  * `planBetween` without ever changing results, and every unrecognized shape
  * must fall back to the full view.
  */
class PrunedSqlEngineSpec extends SparkSpec {

  private def kvTable(prefix: String): GraftTable = {
    import spark.implicits._
    val dir = scratchDir(prefix)
    val base = (0L until 40L).map(k => (k, s"v$k")).toDF("k", "v")
    val t = GraftTable.create(spark, dir, base.schema)
    (0 until 4).foreach(i =>
      t.append(base.filter(col("k") >= i * 10 && col("k") < (i + 1) * 10).coalesce(1)))
    t
  }

  test("a SQL range predicate prunes files and returns exact rows") {
    val t = kvTable("sqlprune-")
    val eng = new SparkSqlEngine(spark)
    eng.registerGraftTable("kv_sql", t)
    val res = eng.execute("SELECT k FROM kv_sql WHERE k >= 12 AND k <= 27 ORDER BY k")
    assert(res.rows.map(_("k").asInstanceOf[Long]) === (12L to 27L))
    assert(eng.lastPrune("kv_sql") === ((2, 4)))
  }

  test("BETWEEN and flipped literal-first comparisons prune too") {
    val t = kvTable("sqlprune-between-")
    val eng = new SparkSqlEngine(spark)
    eng.registerGraftTable("kv_between", t)
    val r1 = eng.execute("SELECT COUNT(*) AS n FROM kv_between WHERE k BETWEEN 31 AND 35")
    assert(r1.rows.head("n") === 5L)
    assert(eng.lastPrune("kv_between") === ((1, 4)))
    val r2 = eng.execute("SELECT COUNT(*) AS n FROM kv_between WHERE 31 <= k AND 35 >= k")
    assert(r2.rows.head("n") === 5L)
    assert(eng.lastPrune("kv_between") === ((1, 4)))
  }

  test("an unfiltered follow-up statement sees the full table again") {
    val t = kvTable("sqlprune-reset-")
    val eng = new SparkSqlEngine(spark)
    eng.registerGraftTable("kv_reset", t)
    eng.execute("SELECT k FROM kv_reset WHERE k >= 35")
    assert(eng.lastPrune("kv_reset") === ((1, 4)))
    val all = eng.execute("SELECT COUNT(*) AS n FROM kv_reset")
    assert(all.rows.head("n") === 40L, "pruned registration leaked into an unfiltered read")
  }

  test("equality predicates prune to the single containing file") {
    val t = kvTable("sqlprune-eq-")
    val eng = new SparkSqlEngine(spark)
    eng.registerGraftTable("kv_eq", t)
    val res = eng.execute("SELECT v FROM kv_eq WHERE k = 23")
    assert(res.rows.map(_("v")) === Seq("v23"))
    assert(eng.lastPrune("kv_eq") === ((1, 4)))
  }

  test("joins and complex shapes fall back to the full view, results exact") {
    val t = kvTable("sqlprune-join-")
    val eng = new SparkSqlEngine(spark)
    eng.registerGraftTable("kv_a", t)
    eng.registerGraftTable("kv_b", t)
    val res = eng.execute(
      "SELECT COUNT(*) AS n FROM kv_a a JOIN kv_b b ON a.k = b.k WHERE a.k >= 30")
    assert(res.rows.head("n") === 10L)
    // expression-over-column predicates are not recognized → full scan, exact rows
    val expr = eng.execute("SELECT COUNT(*) AS n FROM kv_a WHERE k + 0 >= 38")
    assert(expr.rows.head("n") === 2L)
  }

  test("IN-list predicates prune per value, including bucket-transform pinning") {
    import spark.implicits._
    // bucket(8)-partitioned table: a SQL IN-list must keep only the listed
    // keys' hash buckets (the reference's lookup workload shape in SQL)
    val dir = scratchDir("sqlprune-inlist-")
    val base = (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
    val t = GraftTable.create(spark, dir, base.schema,
      partitionCols = Seq("k_bucket"),
      properties = Map(graft.table.GraftTable.PartitionTransformsProp ->
        "bucket(8,k)=k_bucket"))
    t.append(base)
    assert(t.latest.files.size === 8)
    val eng = new SparkSqlEngine(spark)
    eng.registerGraftTable("kv_in", t)
    val res = eng.execute("SELECT k FROM kv_in WHERE k IN (3, 17, 42) ORDER BY k")
    assert(res.rows.map(_("k")) === Seq(3L, 17L, 42L))
    val (scanned, total) = eng.lastPrune("kv_in")
    assert(total === 8 && scanned <= 3,
      s"IN-list must pin to the listed keys' buckets, scanned $scanned of $total")
  }

  test("DML reads the full latest view, never a prior statement's pruned registration") {
    import spark.implicits._
    // the advisor's stale-view case: a filtered read leaves a file-pruned
    // registration; an INSERT INTO ... SELECT whose source is that view must
    // still read EVERY file, or it silently commits a fraction of the rows
    val t = kvTable("sqlprune-dml-stale-")
    val dst = GraftTable.create(spark, scratchDir("sqlprune-dml-dst-"),
      Seq((0L, "x")).toDF("k", "v").schema)
    val eng = new SparkSqlEngine(spark)
    eng.registerGraftTable("kv_src", t)
    eng.registerGraftTable("kv_dst", dst)
    eng.execute("SELECT k FROM kv_src WHERE k >= 35") // leaves 1-of-4 files registered
    assert(eng.lastPrune("kv_src") === ((1, 4)))
    eng.execute("INSERT INTO kv_dst SELECT * FROM kv_src")
    assert(dst.readLatest().count() === 40L,
      "INSERT read a stale file-pruned registration of its source view")
  }

  test("CTAS reads the full latest view, never a prior statement's pruned registration") {
    // the r9 advisor's high finding: tryDdl routes before any refresh, so a
    // filtered read's file-pruned registration leaked into the CTAS source
    // query and silently committed a fraction of the rows
    val t = kvTable("sqlprune-ctas-stale-")
    val eng = new SparkSqlEngine(spark)
    val cat = new graft.catalogsvc.CatalogService(spark, scratchDir("sqlprune-ctas-cat"))
    eng.registerCatalog(cat)
    eng.execute("CREATE NAMESPACE ns")
    eng.registerGraftTable("kv_ctas_src", t)
    eng.execute("SELECT k FROM kv_ctas_src WHERE k >= 35") // 1-of-4 files registered
    assert(eng.lastPrune("kv_ctas_src") === ((1, 4)))
    eng.execute("CREATE TABLE ns.big AS SELECT * FROM kv_ctas_src")
    assert(cat.loadTable("ns", "big").readLatest().count() === 40L,
      "CTAS read a stale file-pruned registration of its source view")
  }

  test("a DML commit re-registers the view for out-of-band readers immediately") {
    import spark.implicits._
    val t = kvTable("sqlprune-dml-refresh-")
    val eng = new SparkSqlEngine(spark)
    eng.registerGraftTable("kv_ref2", t)
    eng.execute("DELETE FROM kv_ref2 WHERE k >= 30")
    // NOT routed through eng.execute: the temp view itself must already
    // point at the post-commit snapshot
    assert(spark.table("kv_ref2").count() === 30L)
  }

  test("the registered view tracks the table's latest snapshot across commits") {
    import spark.implicits._
    val t = kvTable("sqlprune-fresh-")
    val eng = new SparkSqlEngine(spark)
    eng.registerGraftTable("kv_fresh", t)
    assert(eng.execute("SELECT COUNT(*) AS n FROM kv_fresh").rows.head("n") === 40L)
    t.append(Seq((100L, "v100")).toDF("k", "v").coalesce(1))
    assert(eng.execute("SELECT COUNT(*) AS n FROM kv_fresh").rows.head("n") === 41L)
    val pruned = eng.execute("SELECT k FROM kv_fresh WHERE k >= 99")
    assert(pruned.rows.map(_("k")) === Seq(100L))
    assert(eng.lastPrune("kv_fresh") === ((1, 5)))
  }
}
