package graft.maintenance

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.GraftTable

/** Z-order clustering rewrite: multi-dimensional locality so stats pruning
  * works on every listed column, not just a sort's leading one.
  */
class ZorderSpec extends SparkSpec {

  import spark.implicits._

  private def gridTable(): GraftTable = {
    // 100×100 grid: x and y are independent uniform dimensions
    val df = spark.range(10000).select(
      (col("id") % 100).as("x"),
      (col("id") / 100).cast("long").as("y"),
      col("id").as("payload"))
    val t = GraftTable.create(spark, scratchDir("zorder-"), df.schema)
    t.append(df.repartition(8)) // 8 files, each covering the FULL x and y range
    t
  }

  private def scannedFraction(t: GraftTable, colName: String, lo: Long, hi: Long): Double = {
    val (sel, total) = t.planBetween(t.latest, colName, lo, hi)
    sel.size.toDouble / total
  }

  test("z-order rewrite preserves content exactly") {
    val t = gridTable()
    val before = t.readLatest().orderBy("payload").collect()
    val target = t.latest.files.map(_.sizeBytes).sum / 16
    assert(Maintenance.zorderRewrite(t, Seq("x", "y"), target).isDefined)
    assert(t.latest.operation === "zorder-rewrite")
    assert(t.readLatest().orderBy("payload").collect() === before)
  }

  test("after z-order, narrow ranges on BOTH dimensions skip files") {
    val t = gridTable()
    // before: every file covers the full range of both dims — nothing prunes
    assert(scannedFraction(t, "x", 10, 19) === 1.0)
    assert(scannedFraction(t, "y", 10, 19) === 1.0)
    val target = t.latest.files.map(_.sizeBytes).sum / 16
    Maintenance.zorderRewrite(t, Seq("x", "y"), target)
    val fx = scannedFraction(t, "x", 10, 19) // 10% x-strip
    val fy = scannedFraction(t, "y", 10, 19) // 10% y-strip
    assert(fx <= 0.5, s"x-range scanned fraction $fx after z-order")
    assert(fy <= 0.5, s"y-range scanned fraction $fy after z-order")
  }

  test("a linear sort serves only its leading column (the case FOR z-order)") {
    val t = gridTable()
    // plain compaction sorted by x: y-locality is destroyed
    val planned = t.latest
    val sorted = t.readSnapshot(planned)
      .repartitionByRange(16, col("x")).sortWithinPartitions("x")
    t.commitRewrite(sorted, Nil, "sort-x", basedOn = Some(planned))
    assert(scannedFraction(t, "x", 10, 19) <= 0.5)  // leading column prunes
    assert(scannedFraction(t, "y", 10, 19) === 1.0) // the other cannot
  }

  test("z-order write plan has no single-partition bottleneck") {
    val t = gridTable()
    // the rank-via-global-window formulation funnels the table through ONE
    // task; the quantile-bucket formulation must show a range exchange over
    // the z-value and nothing gathering to a single partition
    val df = t.readLatest()
    val zPlan = Maintenance.zorderPlanForAudit(t, Seq("x", "y"))
    val physical = zPlan.queryExecution.executedPlan.toString
    assert(physical.contains("rangepartitioning") || physical.contains("RangePartitioning")
      || physical.toLowerCase.contains("range"), s"expected range exchange in:\n$physical")
    assert(!physical.contains("SinglePartition"), s"single-partition funnel in:\n$physical")
    assert(df.count() === 10000)
  }

  test("z-order rejects strings, partitioned tables, and bad arity") {
    val t = gridTable()
    intercept[IllegalArgumentException] {
      Maintenance.zorderRewrite(t, Seq("x"))
    }
    val ts = spark.range(10).select(col("id").as("k"), lit("s").as("v"))
    val t2 = GraftTable.create(spark, scratchDir("zorder-str-"), ts.schema)
    t2.append(ts)
    intercept[IllegalArgumentException] {
      Maintenance.zorderRewrite(t2, Seq("k", "v"))
    }
    val pdf = spark.range(10).select(col("id").as("k"), (col("id") % 2).as("p"))
    val t3 = GraftTable.create(spark, scratchDir("zorder-part-"), pdf.schema,
      partitionCols = Seq("p"))
    t3.append(pdf)
    intercept[IllegalArgumentException] {
      Maintenance.zorderRewrite(t3, Seq("k", "p"))
    }
  }
}
