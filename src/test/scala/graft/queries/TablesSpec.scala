package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("eventsBetween is inclusive-exclusive and matches a post-conversion filter") {
    val viaRaw = Tables.eventsBetween(spark, sf, "2024-01-05 00:00:00", "2024-01-07 00:00:00")
    val viaConverted = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-07 00:00:00").cast("timestamp"))
    // same rows either way — the raw-ns path is an optimization, not a
    // semantic change (sub-µs truncation can only matter within 1 µs of a
    // boundary, which the deterministic corpus does not contain)
    assert(viaRaw.count() === viaConverted.count())
    assert(viaRaw.select("event_id").exceptAll(viaConverted.select("event_id")).isEmpty)
    // and the range predicate is pushed into the scan
    val pushed = viaRaw.queryExecution.executedPlan.toString
    assert(pushed.contains("GreaterThanOrEqual(ts,") && pushed.contains("LessThan(ts,"),
      s"range filter not pushed:\n$pushed")
  }

  test("an empty window yields zero rows, not an error") {
    assert(Tables.eventsBetween(spark, sf, "1990-01-01 00:00:00", "1990-01-02 00:00:00")
      .count() === 0)
  }
}
