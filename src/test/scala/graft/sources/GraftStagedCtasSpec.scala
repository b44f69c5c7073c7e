package graft.sources

import graft.SparkSpec
import graft.table.GraftTable

/** Atomic CTAS / RTAS through `StagingTableCatalog`: the new table is
  * staged under `<warehouse>/_staging/<uuid>`, written through the normal
  * native batch write, and swapped into place only on success — a failed
  * CTAS leaves NO table behind, and a failed REPLACE leaves the original
  * table fully intact.
  */
class GraftStagedCtasSpec extends SparkSpec {

  private def withCatalog[A](name: String)(body: String => A): A = {
    val wh = scratchDir(s"cat-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    try body(wh)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$name")
      spark.conf.unset(s"spark.sql.catalog.$name.warehouse")
    }
  }

  private def stagingLeftovers(wh: String): Seq[String] = {
    val d = new java.io.File(s"$wh/_staging")
    if (!d.isDirectory) Nil
    else d.listFiles().map(_.getName).toSeq
  }

  test("CTAS commits atomically; REPLACE TABLE AS SELECT swaps content") {
    withCatalog("stg1") { wh =>
      spark.sql("CREATE NAMESPACE stg1.m")
      spark.sql("CREATE TABLE stg1.m.t AS SELECT id, id * 2 AS v FROM RANGE(10)")
      assert(spark.table("stg1.m.t").count() == 10)
      // the staged path is gone, the committed table is a real graft table
      assert(stagingLeftovers(wh).isEmpty, stagingLeftovers(wh))
      assert(GraftTable.exists(spark, s"$wh/m/t"))

      spark.sql("REPLACE TABLE stg1.m.t AS SELECT id, id * 10 AS w FROM RANGE(3)")
      val rows = spark.sql("SELECT * FROM stg1.m.t ORDER BY id").collect()
      assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 10L, 20L))
      assert(spark.table("stg1.m.t").columns.toSeq == Seq("id", "w"))
      assert(stagingLeftovers(wh).isEmpty, stagingLeftovers(wh))

      // REPLACE of a missing table refuses (stage-time NoSuchTable)
      intercept[Exception](
        spark.sql("REPLACE TABLE stg1.m.missing AS SELECT 1 AS x"))
    }
  }

  test("writeTo create / replace / createOrReplace ride the staged path") {
    withCatalog("stg2") { _ =>
      import spark.implicits._
      spark.sql("CREATE NAMESPACE stg2.w")
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag").writeTo("stg2.w.t").create()
      assert(spark.table("stg2.w.t").count() == 2)
      // create over an existing name refuses at stage time
      intercept[Exception](
        Seq((9L, "z")).toDF("id", "tag").writeTo("stg2.w.t").create())
      Seq((3L, "c")).toDF("id", "tag").writeTo("stg2.w.t").replace()
      assert(spark.table("stg2.w.t").as[(Long, String)].collect().toSeq ==
        Seq((3L, "c")))
      Seq((4L, 4.0)).toDF("id", "score").writeTo("stg2.w.t").createOrReplace()
      assert(spark.table("stg2.w.t").columns.toSeq == Seq("id", "score"))
      Seq((5L, 5.0)).toDF("id", "score").writeTo("stg2.w.fresh").createOrReplace()
      assert(spark.table("stg2.w.fresh").count() == 1)
    }
  }

  test("failed CTAS leaves no table and no staging leftovers") {
    withCatalog("stg3") { wh =>
      spark.sql("CREATE NAMESPACE stg3.m")
      intercept[Exception] {
        spark.sql("""CREATE TABLE stg3.m.broken AS
          SELECT id, assert_true(id < 5) AS boom FROM RANGE(10)""").collect()
      }
      assert(!spark.sql("SHOW TABLES IN stg3.m").collect()
        .map(_.getString(1)).contains("broken"))
      intercept[Exception](spark.table("stg3.m.broken").collect())
      assert(!new java.io.File(s"$wh/m/broken").exists(),
        "failed CTAS left a partial table directory")
      assert(stagingLeftovers(wh).isEmpty,
        s"failed CTAS left staging dirs: ${stagingLeftovers(wh)}")
    }
  }

  test("failed REPLACE AS SELECT leaves the original table intact") {
    withCatalog("stg4") { wh =>
      spark.sql("CREATE NAMESPACE stg4.m")
      spark.sql("CREATE TABLE stg4.m.keep AS SELECT id, id * 3 AS v FROM RANGE(4)")
      val before = spark.sql("SELECT SUM(v) FROM stg4.m.keep").head.getLong(0)
      intercept[Exception] {
        spark.sql("""REPLACE TABLE stg4.m.keep AS
          SELECT id, assert_true(id < 5) AS boom FROM RANGE(10)""").collect()
      }
      // the original survives the failed swap, byte-for-byte readable
      assert(spark.sql("SELECT SUM(v) FROM stg4.m.keep").head.getLong(0) == before)
      assert(spark.table("stg4.m.keep").columns.toSeq == Seq("id", "v"))
      assert(stagingLeftovers(wh).isEmpty,
        s"failed REPLACE left staging dirs: ${stagingLeftovers(wh)}")
    }
  }
}
