package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dml.Dml

/** Sharded delete-vector writes: above the size ceiling a MOR delete
  * commit writes one delete file PER SHARD instead of funneling the whole
  * vector through `coalesce(1)` — and the multi-file commit round-trips
  * identically on the read side (per-commit files union).
  */
class DeleteShardSpec extends SparkSpec {

  test("large positional DV shards into multiple files; read reconciles") {
    import spark.implicits._
    val dir = scratchDir("dv-shard") + "/t"
    val df = (1 to 4000).map(i => (i.toLong, i % 7)).toDF("id", "grp")
    val t = GraftTable.create(spark, dir, df.schema)
    t.append(df.repartition(4))
    sys.props("graft.test.delete-shard-bytes") = "1024" // force the sharded path
    try {
      Dml.deleteMorPositional(t, col("id") % 2 === 0)
      val delFiles = t.latest.deletes
      assert(delFiles.size > 1,
        s"expected a sharded multi-file DV commit, got ${delFiles.size} file(s)")
      assert(t.readLatest().count() == 2000)
      assert(t.readLatest().agg(min("id"), max("id")).head.toSeq == Seq(1L, 3999L))
      // connector read reconciles the sharded vector identically
      assert(spark.read.format("graft").load(dir).count() == 2000)
    } finally sys.props.remove("graft.test.delete-shard-bytes")
  }

  test("small key-batch deletes keep the single-file shape") {
    import spark.implicits._
    val dir = scratchDir("dv-single") + "/t"
    val df = (1 to 100).map(i => (i.toLong, s"u$i")).toDF("id", "u")
    val t = GraftTable.create(spark, dir, df.schema)
    t.append(df)
    Dml.deleteMorKeys(t, Seq(1L, 2L).toDF("id"))
    assert(t.latest.deletes.size == 1)
    assert(t.readLatest().count() == 98)
  }
}
