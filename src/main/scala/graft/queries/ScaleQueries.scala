package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.SkewSalting

/** Scale-technique operators exposed as oracle-checked queries: each result
  * is semantically identical to its naive formulation (that IS the oracle),
  * while the plan demonstrates the technique — salting for skew, bucketed
  * co-located joins.
  */
object ScaleQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  // Hash-stable output: exact decimal snapped to scale 2, emitted as double
  // (decimal strings carry trailing zeros that a float-normalizing hash drops).
  private def dbl(c: org.apache.spark.sql.Column) = dec(c).cast("double")

  val queries: Map[String, Q] = Map(
    // Two-phase salted aggregation == plain group-by (decimal sums → exact)
    "skew_salted_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("v", dec(col("value")))
      SkewSalting.saltedAgg(ev, "event_type", "v")
        .select(col("event_type"), col("cnt"), dbl(col("total")).as("total"))
        .orderBy("event_type")
    }),

    // Salted join == plain join: skewed events × per-user dim
    "skew_salted_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dim = ev.select(col("user_id")).distinct()
        .withColumn("user_bucket", pmod(col("user_id"), lit(5L)))
      SkewSalting.saltedJoin(ev, dim, "user_id")
        .groupBy("user_bucket")
        .agg(count(lit(1)).as("cnt"), dbl(sum(dec(col("value")))).as("total"))
        .orderBy("user_bucket")
    }),

    // Bucketed co-located join: both sides bucketed by the join key on disk,
    // so the join needs NO exchange (verified by BucketedJoinSpec). The
    // result equals the plain parquet join — that's the oracle.
    "j5_bucketed_join" -> ((s, dir) => {
      s.sql("DROP TABLE IF EXISTS orders_bkt")
      s.sql("DROP TABLE IF EXISTS customer_bkt")
      // a fresh JVM has an empty in-memory catalog but the warehouse files
      // survive on disk — clear them so saveAsTable never hits a stale path
      Seq("orders_bkt", "customer_bkt").foreach { t =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(new java.io.File(s"/root/repo/target/spark-warehouse/$t"))
      }
      Tables.orders(s, dir).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      Tables.customer(s, dir).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bkt")
      s.table("orders_bkt")
        .join(s.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dbl(sum(dec(col("o_totalprice")))).as("revenue"))
        .orderBy("c_mktsegment")
    })
  )

  val oracle: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT event_type, COUNT(*) AS cnt,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
         FROM events GROUP BY event_type ORDER BY event_type""",
    "skew_salted_join" ->
      """SELECT user_id % 5 AS user_bucket, COUNT(*) AS cnt,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
         FROM events GROUP BY 1 ORDER BY user_bucket""",
    "j5_bucketed_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment"""
  )
}
