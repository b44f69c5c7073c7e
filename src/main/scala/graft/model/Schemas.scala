package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for the two canonical tables of the reference.
  *
  * `sales_events`: reference spec `ICEBERG-Interoperability-Test-Spec.md:48-52`,
  * dataset config `iceberg-tests/config/framework.yaml:124-132`.
  * `tx_events`: reference `blob_dfs/blob-dfs_bench.py:74-88`.
  */
object Schemas {

  val salesEvents: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("tenant_id", IntegerType),
    StructField("event_ts", TimestampType),
    StructField("sku", StringType),
    StructField("qty", IntegerType),
    StructField("price", DecimalType(18, 2)),
    StructField("country", StringType),
    StructField("ds", DateType)
  ))

  val txEvents: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("ts", TimestampType),
    StructField("amount", DoubleType),
    StructField("city", StringType),
    StructField("category", StringType)
  ))
}
