package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: two-phase salted aggregation and a salted
  * broadcast-side explode for skewed joins.
  *
  * At 100 TB a hot key (one user producing 1% of all events) pins a single
  * reducer in a plain `groupBy(key)`. Salting splits each key across
  * `saltBuckets` partial groups (phase 1: shuffle on (key, salt) — uniform),
  * then combines the partials (phase 2: shuffle on key — but now one row per
  * (key, salt), so the hot key carries `saltBuckets` rows, not billions).
  * AQE's skew-join handling covers sort-merge joins; explicit salting covers
  * aggregations and broadcast-ineligible joins.
  */
object SkewSalting {

  /** Two-phase salted count/sum aggregation, equivalent to
    * `df.groupBy(key).agg(count, sum(valueCol))` on any data, robust on skew.
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(col(valueCol)).as("_sum"))
    partial.groupBy(col(key))
      .agg(sum(col("_cnt")).as("cnt"), sum(col("_sum")).as("total"))
  }

  /** Salted join for a skewed left side against a small-ish right side that
    * is still too big (or unsuitable) to broadcast: the left gets a random
    * salt in [0, n), the right is exploded n ways, and the join key becomes
    * (key, salt) — the hot key's rows spread across n partitions.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val l = skewed.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val r = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
