package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.GraftTable

/** Connector-side evolution replay: `format("graft")` batch reads of files
  * written under an OLDER schema resolve through the per-file column
  * mapping (rename → physical name, widen → cast, add-with-default →
  * constant, drop → gone) instead of refusing — value-identical to the
  * table API's own readLatest replay.
  */
class GraftConnectorEvolutionSpec extends SparkSpec {

  test("rename + widen + add-default + drop replay through format(graft)") {
    import spark.implicits._
    val dir = scratchDir("conn-evolve") + "/t"
    val v1 = Seq((1, "a", 1.5f), (2, "b", 2.5f)).toDF("id", "name", "score")
    val t = GraftTable.create(spark, dir, v1.schema)
    t.append(v1)
    t.renameColumn("name", "label")
    t.widenColumn("id", "BIGINT")
    t.addColumn("grade", "STRING", "none")
    t.addColumn("note", "STRING") // no default -> NULL replay
    t.widenColumn("score", "DOUBLE")
    // post-evolution file under the current shape
    t.append(Seq((3L, "c", 3.5, "good", "n3")).toDF("id", "label", "score", "grade", "note"))

    val df = spark.read.format("graft").load(dir).orderBy("id")
    assert(df.columns.toSeq == Seq("id", "label", "score", "grade", "note"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      r.getString(3), Option(r.getString(4)))).toSeq
    assert(rows == Seq(
      (1L, "a", 1.5, "none", None),
      (2L, "b", 2.5, "none", None),
      (3L, "c", 3.5, "good", Some("n3"))))
    // value parity with the table API's own replay
    val api = t.readLatest().orderBy("id").collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq == api)

    // dropped column vanishes from old files too
    t.dropColumn("note")
    val df2 = spark.read.format("graft").load(dir)
    assert(df2.columns.toSeq == Seq("id", "label", "score", "grade"))
    assert(df2.count() == 3)
  }

  test("evolved read keeps pruning + projection; aggregates stay correct") {
    import spark.implicits._
    val dir = scratchDir("conn-evolve2") + "/t"
    val v1 = (1 to 100).map(i => (i, i * 1.0)).toDF("k", "v")
    val t = GraftTable.create(spark, dir, v1.schema)
    t.append(v1)
    t.widenColumn("k", "BIGINT")
    t.append((101 to 200).map(i => (i.toLong, i * 1.0)).toDF("k", "v"))
    val df = spark.read.format("graft").load(dir)
    assert(df.filter(col("k") <= 150L).count() == 150L)
    assert(df.agg(sum("k")).head.getLong(0) == (1L to 200L).sum)
    // projection of only the widened column still decodes
    assert(df.select("k").agg(max("k")).head.getLong(0) == 200L)
  }

  test("_file metadata column: constant per file, no file bytes needed") {
    import spark.implicits._
    val dir = scratchDir("conn-file") + "/t"
    val data = (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val t = GraftTable.create(spark, dir, data.schema)
    t.append(data.filter(col("id") <= 5).coalesce(1))
    t.append(data.filter(col("id") > 5).coalesce(1))
    val df = spark.read.format("graft").load(dir).select(col("id"), col("_file"))
    val byFile = df.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(byFile.map(_._2).distinct.length == t.latest.files.size)
    // rows written together share a _file; files carry their real paths
    val groups = byFile.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(groups == Set((1L to 5L).toSet, (6L to 10L).toSet))
    assert(byFile.forall(_._2.startsWith(dir)))
  }
}
