package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators a training-data / event pipeline needs constantly
  * and vanilla Spark SQL only expresses as theta joins (SURVEY.md §2 "custom
  * operators" preference (a): compose existing ops — no custom SparkPlan is
  * required because both semantics reduce to shuffle-on-key plans).
  *
  * Scale design:
  *  - `asOf`: union + running `last(ignoreNulls)` window — ONE shuffle on the
  *    key, one partition-local sort, never a per-key collect and never the
  *    O(left × right) BroadcastNestedLoopJoin Spark plans for
  *    `l.ts >= r.ts` theta conditions.
  *  - `pointInInterval`: fixed-width time bucketing turns a range predicate
  *    into an equi-join on (key, bucket) with a residual filter; an interval
  *    of width ≤ bucket explodes into at most 2 bucket rows, so shuffled
  *    rows stay O(inputs), not O(pairs).
  */
object TemporalJoins {

  /** As-of join: attach to every left row the payload of the single most
    * recent right row with `right.ts <= left.ts` for the same `key`
    * (NULL payload when no such row exists — LEFT ASOF semantics).
    *
    * Right columns other than `key`/`tsCol` become the payload and must not
    * clash with left column names. For a deterministic payload the right side
    * must be unique per (key, ts) — pre-aggregate duplicates away.
    *
    * Skew bound: all rows of one key land in ONE window partition and sort
    * there — tested correct and tractable at 10^5 rows per key
    * (TemporalJoinsSpec); a genuinely hot key far past that needs a
    * two-phase variant (pre-bucket each key by coarse time range, run the
    * running-last within buckets, then stitch bucket boundaries with a
    * per-(key,bucket) carry join — one extra shuffle).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != tsCol).toSeq
    val clash = payloadCols.toSet intersect left.columns.toSet
    require(payloadCols.nonEmpty, "right side carries no payload columns")
    require(clash.isEmpty, s"right payload columns clash with left: ${clash.mkString(", ")}")
    val leftRow = struct(left.columns.map(col).toIndexedSeq: _*)
    val payload = struct(payloadCols.map(col): _*)
    val leftRowType = left.select(leftRow).schema.head.dataType
    val payloadType = right.select(payload).schema.head.dataType
    val lNorm = left.select(
      col(key).as("_k"), col(tsCol).as("_ts"), lit(1).as("_side"),
      leftRow.as("_row"), lit(null).cast(payloadType).as("_payload"))
    val rNorm = right.select(
      col(key).as("_k"), col(tsCol).as("_ts"), lit(0).as("_side"),
      lit(null).cast(leftRowType).as("_row"), payload.as("_payload"))
    // Right rows sort BEFORE left rows at equal ts, so `<=` matches ties; the
    // running last(ignoreNulls) carries the newest right payload forward.
    val w = Window.partitionBy("_k").orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(c => col(s"_row.$c").as(c)) ++
        payloadCols.map(c => col(s"_asof.$c").as(c)): _*)
  }

  /** Point-in-interval join: all (point, interval) pairs with the same `key`
    * and `start <= ts <= end`. Both ts and interval bounds are bucketed to
    * `bucketMicros`-wide cells; the join is an equi-join on (key, bucket) and
    * the exact BETWEEN predicate filters residual pairs. Each (point,
    * interval) pair can match in only the point's single bucket, so the
    * output carries no bucketing duplicates.
    *
    * Intervals wider than `bucketMicros` explode into more cells — pick the
    * bucket width near the typical interval width (≤2 cells per interval).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucket width must be positive")
    val b = lit(bucketMicros)
    val ip = intervals.withColumn("_b",
      explode(sequence(floor(unix_micros(col(startCol)) / b),
        floor(unix_micros(col(endCol)) / b))))
    val pp = points.withColumn("_b", floor(unix_micros(col(tsCol)) / b))
    pp.join(ip, Seq(key, "_b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_b")
  }
}
