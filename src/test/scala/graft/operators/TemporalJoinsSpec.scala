package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def withTs(df: org.apache.spark.sql.DataFrame, from: String, to: String) =
    df.withColumn(to, timestamp_micros(col(from))).drop(from)

  test("asOf picks the most recent right row at or before each left ts (ties match)") {
    val left = withTs(Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag"), "t", "ts")
    val right = withTs(Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 90.0))
      .toDF("k", "t", "v"), "t", "ts")
    val out = TemporalJoins.asOf(left, right, "k", "ts")
      .select("k", "tag", "v").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    // t=10 matches the equal-ts right row (<=); t=20 → right t=15;
    // t=5 and (k=2, t=7) precede every right row → NULL payload
    assert(out === Set(
      (1L, "a", Some(100.0)), (1L, "b", Some(150.0)),
      (1L, "c", None), (2L, "d", None)))
  }

  test("asOf plans a shuffle+window, never a nested-loop theta join") {
    val left = withTs(Seq((1L, 10L, "a")).toDF("k", "t", "tag"), "t", "ts")
    val right = withTs(Seq((1L, 9L, 1.0)).toDF("k", "t", "v"), "t", "ts")
    val plan = TemporalJoins.asOf(left, right, "k", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"theta-join shape leaked into the as-of plan:\n$plan")
    assert(plan.contains("Window"), s"expected a window plan:\n$plan")
  }

  test("asOf stays correct under a hot key (10^5 rows on one window partition)") {
    // the skew bound (documented on asOf): one key's rows all land in one
    // window partition and sort there. 1e5 hot rows must stay correct and
    // finish — the analytically-known match is floor(ts/10)*10.
    val n = 100000L
    val left = spark.range(n).select(lit(1L).as("k"), col("id").as("ts"))
    val right = spark.range(n / 10).select(lit(1L).as("k"),
      (col("id") * 10).as("ts"), (col("id") * 10).as("p"))
    val out = TemporalJoins.asOf(left, right, "k", "ts")
    assert(out.count() === n)
    val expected = col("ts") - (col("ts") % 10)
    assert(out.filter(col("p").isNull || col("p") =!= expected).count() === 0)
  }

  test("asOfSalted equals asOf, including across bucket boundaries and the hot key") {
    // hot key 1: 5000 left rows, rights at multiples of 10 — bucket width 97
    // deliberately misaligns with the right cadence so matches must cross
    // bucket boundaries through the carry; key 2 has a bucket with no rights
    val left = spark.range(5000).select(lit(1L).as("k"), col("id").as("ts"))
      .union(spark.range(5).select(lit(2L).as("k"), (col("id") + 500).as("ts")))
    val right = spark.range(500).select(lit(1L).as("k"),
      (col("id") * 10).as("ts"), (col("id") * 10).as("p"))
      .union(spark.range(1).select(lit(2L).as("k"), lit(0L).as("ts"), lit(-7L).as("p")))
    val plain = TemporalJoins.asOf(left, right, "k", "ts")
    val salted = TemporalJoins.asOfSalted(left, right, "k", "ts", bucketWidth = 97)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("pointInInterval equals the BETWEEN theta join, without duplicates") {
    // seconds → micros; bucket width 10s forces intervals to span 2 cells
    val us = 1000000L
    val points = withTs(Seq((1L, 100 * us, 1.0), (1L, 305 * us, 2.0), (2L, 100 * us, 3.0))
      .toDF("k", "t", "pv"), "t", "ts")
    val intervals = withTs(withTs(
      Seq((1L, 95 * us, 105 * us), (1L, 100 * us, 100 * us), (2L, 200 * us, 300 * us))
        .toDF("k", "s", "e"), "s", "start_ts"), "e", "end_ts")
    val fast = TemporalJoins.pointInInterval(points, intervals, "k",
      "ts", "start_ts", "end_ts", bucketMicros = 10 * us)
      .select("k", "ts", "pv", "start_ts", "end_ts")
    val naive = points.join(intervals, Seq("k"))
      .filter(col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .select("k", "ts", "pv", "start_ts", "end_ts")
    assert(fast.collect().toSeq.sortBy(_.toString) ===
      naive.collect().toSeq.sortBy(_.toString))
    // the 100s point matches both rows of k=1 exactly once each
    assert(fast.count() === 2)
  }
}
