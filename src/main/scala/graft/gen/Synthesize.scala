package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-data generator, the Scala analog of the reference's
  * `synthesise(n)` (`blob_dfs/blob-dfs_bench.py:48-65`): `spark.range(n)` plus
  * purely-column-derived attributes, so the result is reproducible at any scale
  * and any parallelism.
  *
  * Scale note: `spark.range` produces a splittable source with no shuffle; every
  * derived column is a codegen'd projection, so generation parallelizes linearly
  * with executors at 100 TB-scale row counts. Only `amount` uses `rand(seed)`,
  * which is deterministic per (seed, partition, row-offset) — we pin
  * `numPartitions` on the range so the sequence is stable across runs.
  */
object Synthesize {

  /** 2025-01-01 00:00:00 UTC, reference `blob-dfs_bench.py:54`. */
  val EpochBase = 1735689600L
  val Cities: Seq[String] =
    Seq("Paris", "Seoul", "Tokyo", "Lyon", "Lille", "Marseille", "Nantes", "Bordeaux")
  val Categories: Seq[String] = Seq("A", "B", "C", "D", "E")
  val SecondsIn30Days: Long = 60L * 60 * 24 * 30

  /** tx_events(user_id, ts, amount, city, category) — see FIXTURES.md §F2. */
  def txEvents(spark: SparkSession, n: Long, partitions: Int = 32): DataFrame = {
    val cities = array(Cities.map(lit): _*)
    val cats = array(Categories.map(lit): _*)
    spark.range(0, n, 1, partitions)
      .withColumnRenamed("id", "user_id")
      .withColumn("ts", to_timestamp(from_unixtime(lit(EpochBase) + col("user_id") % SecondsIn30Days)))
      // hash-derived uniform in [0, 1000): unlike rand(seed) — whose draw
      // depends on Spark's partition-seeded XORShift and therefore on the
      // PARTITIONING — this is a pure function of user_id, so the generator
      // is deterministic across engines, partitionings, and re-runs (and
      // the full table is DuckDB-oracle-checkable). Knuth multiplicative
      // hash + one xor-shift mix round: pure 64-bit integer arithmetic
      // (overflow-free for user_id < ~3.4e9), ~10x cheaper per row than a
      // string md5 — the generator runs INSIDE the timed write phases, so
      // its cost lands on write_append in every bench artifact.
      .withColumn("amount", {
        val h0 = col("user_id") * lit(2654435761L) + lit(40503L)
        round(pmod(h0.bitwiseXOR(shiftright(h0, 16)), lit(1000000L))
          .cast("double") / 1000.0, 3)
      })
      .withColumn("city", element_at(cities, (col("user_id") % Cities.size).cast("int") + 1))
      .withColumn("category", element_at(cats, (col("user_id") % Categories.size).cast("int") + 1))
  }

  /** The 8-row literal `sales_events` interop dataset
    * (reference `sql/spark/open_catalog/bulk_insert_sales_events.sql:3-11`).
    */
  def salesEvents8(spark: SparkSession): DataFrame = {
    spark.sql("""
      SELECT * FROM VALUES
        (1L, 10, TIMESTAMP '2024-01-01 00:00:00', 'sku-0001', 3, CAST(19.99 AS DECIMAL(18,2)), 'US', DATE '2024-01-01'),
        (2L, 11, TIMESTAMP '2024-01-01 00:05:00', 'sku-0002', 5, CAST(5.00 AS DECIMAL(18,2)), 'US', DATE '2024-01-01'),
        (3L, 12, TIMESTAMP '2024-01-02 09:30:00', 'sku-0003', 2, CAST(10.00 AS DECIMAL(18,2)), 'GB', DATE '2024-01-02'),
        (4L, 13, TIMESTAMP '2024-01-02 10:45:00', 'sku-0004', 8, CAST(7.50 AS DECIMAL(18,2)), 'FR', DATE '2024-01-02'),
        (5L, 10, TIMESTAMP '2024-01-03 12:00:00', 'sku-0005', 1, CAST(99.99 AS DECIMAL(18,2)), 'US', DATE '2024-01-03'),
        (6L, 11, TIMESTAMP '2024-01-03 13:25:00', 'sku-0002', 10, CAST(5.00 AS DECIMAL(18,2)), 'US', DATE '2024-01-03'),
        (7L, 12, TIMESTAMP '2024-01-04 15:55:00', 'sku-0003', 4, CAST(11.00 AS DECIMAL(18,2)), 'GB', DATE '2024-01-04'),
        (8L, 13, TIMESTAMP '2024-01-05 16:10:00', 'sku-0004', 6, CAST(7.50 AS DECIMAL(18,2)), 'FR', DATE '2024-01-05')
      AS t(event_id, tenant_id, event_ts, sku, qty, price, country, ds)
    """)
  }
}
