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
    * (TemporalJoinsSpec); for a genuinely hot key past that, use
    * `asOfSalted`, which spreads each key over time-range buckets.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String): DataFrame = {
    val (unioned, payloadCols) = normalized(left, right, key, tsCol)
    // Right rows sort BEFORE left rows at equal ts, so `<=` matches ties; the
    // running last(ignoreNulls) carries the newest right payload forward.
    val w = Window.partitionBy("_k").orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(unioned.withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w)),
      left, payloadCols)
  }

  /** Two-phase SALTED as-of join — same semantics as `asOf`, for hot keys
    * past the single-window-partition bound. Rows are bucketed by coarse time
    * range, the running last runs per (key, bucket) (phase 1 — the hot key's
    * rows now spread over many partitions), and a per-(key, bucket) carry
    * window (one row per bucket, tiny) supplies the newest right payload from
    * earlier buckets to rows that precede every right row in their own bucket
    * (phase 2). Costs one extra shuffle + a small join over `asOf`.
    *
    * `bucketWidth` is in micros for timestamp ts columns, in the column's own
    * units for numeric ts. Pick it so a bucket holds ≲10^5 rows of the
    * hottest key.
    */
  def asOfSalted(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucket width must be positive")
    val (u0, payloadCols) = normalized(left, right, key, tsCol)
    val tsLong = u0.schema("_ts").dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col("_ts"))
      case _ => col("_ts").cast("long")
    }
    val u = u0.withColumn("_b", floor(tsLong / lit(bucketWidth)))
    // Phase 1 — running last within (key, bucket); ties ordered as in asOf.
    val w1 = Window.partitionBy("_k", "_b").orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = u.withColumn("_within", last(col("_payload"), ignoreNulls = true).over(w1))
    // Phase 2 — carry-in per bucket: the newest right payload of any EARLIER
    // bucket. One row per (key, bucket) rides this window, so the hot key's
    // serial portion is O(buckets), not O(rows).
    val bucketLast = u.filter(col("_side") === 0)
      .groupBy("_k", "_b")
      .agg(max_by(col("_payload"), col("_ts")).as("_blast"))
    val wc = Window.partitionBy("_k").orderBy(col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u.select("_k", "_b").distinct()
      .join(bucketLast, Seq("_k", "_b"), "left")
      .withColumn("_carry", last(col("_blast"), ignoreNulls = true).over(wc))
      .drop("_blast")
    project(
      within.join(carry, Seq("_k", "_b"))
        .withColumn("_asof", coalesce(col("_within"), col("_carry"))),
      left, payloadCols)
  }

  /** Shared asOf normalization: tag left/right rows onto one narrow frame
    * (`_k`,`_ts`,`_side`,`_row`,`_payload`) so the match is a window, never a
    * theta join.
    */
  private def normalized(left: DataFrame, right: DataFrame, key: String,
      tsCol: String): (DataFrame, Seq[String]) = {
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
    (lNorm.unionByName(rNorm), payloadCols)
  }

  private def project(df: DataFrame, left: DataFrame, payloadCols: Seq[String]): DataFrame =
    df.filter(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(c => col(s"_row.$c").as(c)) ++
        payloadCols.map(c => col(s"_asof.$c").as(c)): _*)

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
