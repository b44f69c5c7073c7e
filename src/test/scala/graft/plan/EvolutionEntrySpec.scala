package graft.plan

import graft.SparkSpec

/** Drives the h_sql_evolution harness entry end to end (the driver's
  * Verify surface for it), so a failure shows up in sbt test with the
  * full stack instead of only in the driver's dump log.
  */
class EvolutionEntrySpec extends SparkSpec {
  test("h_sql_evolution harness entry produces the oracle row") {
    val df = graft.queries.HarnessQueries.queries("h_sql_evolution")(spark, "unused")
    val r = df.collect()
    assert(r.length == 1)
    val m = df.columns.zip(r.head.toSeq).toMap
    assert(m("web_n") == 4L, s"web_n: ${m("web_n")}")
    assert(m("web_qty") == 18L)
    assert(m("web_revenue") == 42.49)
    assert(m("app_n") == 1L)
    assert(m("app_qty") == 2L)
    assert(m("app_revenue") == 10.0)
    assert(m("described") == "event_id:bigint,tenant_id:bigint,event_ts:timestamp_ntz,product_sku:string,qty:bigint,price:decimal(18,2),ds:date,channel:string", s"described: ${m("described")}")
    assert(m("tables_before") == "sales_events,tmp_probe")
    assert(m("tables_after") == "sales_events")
  }

  test("h_sql_maintenance harness entry produces the oracle row") {
    val df = graft.queries.HarnessQueries.queries("h_sql_maintenance")(spark, "unused")
    val r = df.collect()
    assert(r.length == 1)
    val m = df.columns.zip(r.head.toSeq).toMap
    assert(m("row_count") == 6L)
    assert(m("total_qty") == 25L)
    assert(m("files_rewritten") == 6L, s"files_rewritten: ${m("files_rewritten")}")
    assert(m("files_added") == 1L)
    assert(m("manifests_consolidated") == true)
    assert(m("snapshots_deleted") == 3L, s"snapshots_deleted: ${m("snapshots_deleted")}")
    assert(m("files_after") == 1L)
    assert(m("snapshots_after") == 2L)
  }
}
