package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dml.Dml
import graft.table.GraftTable

/** Exactly-once CDC mirroring between snapshot tables: incremental cycles,
  * idempotent retries, convergent replay after a lost offset, and loud
  * refusal on non-CDC-friendly source history.
  */
class TableFollowSpec extends SparkSpec {

  private def content(t: GraftTable) =
    t.readLatest().orderBy("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def mkPair(name: String) = {
    import spark.implicits._
    val schema = Seq((0L, "x")).toDF("k", "v").schema
    val src = GraftTable.create(spark, scratchDir(s"$name-src"), schema)
    val dst = GraftTable.create(spark, scratchDir(s"$name-dst"), schema)
    (src, dst)
  }

  test("incremental cycles mirror appends, upserts, and deletes exactly") {
    import spark.implicits._
    val (src, dst) = mkPair("follow")
    src.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))

    val off1 = TableFollow.follow(src, dst, Seq("k"))
    assert(off1.contains(src.latest.snapshotId))
    assert(content(dst) == Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // nothing new: a second cycle is a durable no-op
    assert(TableFollow.follow(src, dst, Seq("k")).isEmpty)
    val nSnapsBefore = dst.snapshotsList.size
    assert(dst.snapshotsList.size == nSnapsBefore)

    // upsert (2 → b2, 4 inserted), then delete key 1, then follow once
    Dml.upsertMor(src, Seq((2L, "b2"), (4L, "d")).toDF("k", "v"), Seq("k"))
    Dml.deleteMorKeys(src, Seq(1L).toDF("k"))
    val off2 = TableFollow.follow(src, dst, Seq("k"))
    assert(off2.contains(src.latest.snapshotId))
    assert(content(dst) == Seq((2L, "b2"), (3L, "c"), (4L, "d")))
    assert(content(dst) == content(src))
    // one atomic commit applied both source commits' net effect
    assert(dst.latest.operation == "follow-cdc")
  }

  test("replay from a lost offset converges to the same state") {
    import spark.implicits._
    val (src, dst) = mkPair("follow-replay")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    Dml.upsertMor(src, Seq((1L, "a2")).toDF("k", "v"), Seq("k"))
    TableFollow.follow(src, dst, Seq("k"))
    assert(content(dst) == Seq((1L, "a2"), (2L, "b")))

    // a fresh follower with NO offset replays the whole history (the
    // lost-marker case) into the same final state
    val dst2 = GraftTable.create(spark, scratchDir("follow-replay-dst2"),
      src.schema)
    TableFollow.follow(src, dst2, Seq("k"))
    assert(content(dst2) == content(dst))
  }

  test("append with duplicate keys mirrors every row, not a per-key winner") {
    import spark.implicits._
    val (src, dst) = mkPair("follow-dup")
    src.append(Seq((1L, "a"), (1L, "a-again"), (2L, "b")).toDF("k", "v"))
    TableFollow.follow(src, dst, Seq("k"))
    assert(content(dst) == Seq((1L, "a"), (1L, "a-again"), (2L, "b")))
  }

  test("a key appended in TWO separate commits in one cycle keeps both commits' rows") {
    import spark.implicits._
    // the advisor's additive-append case: append is not a per-key
    // replacement, so last-commit-wins must not drop the earlier commit's
    // rows when the key saw only appends in range
    val (src, dst) = mkPair("follow-two-appends")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    src.append(Seq((1L, "a-later"), (3L, "c")).toDF("k", "v"))
    TableFollow.follow(src, dst, Seq("k"))
    assert(content(dst) == Seq((1L, "a"), (1L, "a-later"), (2L, "b"), (3L, "c")))
    assert(content(dst) == content(src))
  }

  test("an append-only cycle keeps a key's pre-range mirror rows (no spurious delete)") {
    import spark.implicits._
    val (src, dst) = mkPair("follow-additive")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    TableFollow.follow(src, dst, Seq("k"))
    // next cycle: the SAME key receives another append — its first-cycle
    // mirror row must survive (appends never clear)
    src.append(Seq((1L, "a2")).toDF("k", "v"))
    TableFollow.follow(src, dst, Seq("k"))
    assert(content(dst) == Seq((1L, "a"), (1L, "a2"), (2L, "b")))
    assert(content(dst) == content(src))
    // ...but a delete-bearing commit still clears: upsert replaces BOTH rows
    Dml.upsertMor(src, Seq((1L, "final")).toDF("k", "v"), Seq("k"))
    TableFollow.follow(src, dst, Seq("k"))
    assert(content(dst) == Seq((1L, "final"), (2L, "b")))
    assert(content(dst) == content(src))
  }

  test("followAgg maintains exact group counts/sums; empty groups leave the view") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = Seq((0L, "x", 0.0)).toDF("k", "g", "v").schema
    val src = GraftTable.create(spark, scratchDir("ivm-src"), schema)
    val dst = GraftTable.create(spark, scratchDir("ivm-dst"), StructType(Seq(
      StructField("g", StringType), StructField("n_rows", LongType),
      StructField("sum_val", DecimalType(18, 2)))))
    def view = dst.readLatest().orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue())).toSeq
    src.append(Seq((1L, "a", 1.5), (2L, "a", 2.5), (3L, "b", 10.0)).toDF("k", "g", "v"))
    assert(TableFollow.followAgg(src, dst, Seq("g"), "v").isDefined)
    assert(view == Seq(("a", 2L, 4.0), ("b", 1L, 10.0)))
    // idle cycle is a no-op commit-wise (offset unchanged, no double-apply)
    val commits = dst.snapshotsList.size
    assert(TableFollow.followAgg(src, dst, Seq("g"), "v").isEmpty)
    assert(dst.snapshotsList.size == commits)
    // upsert moves a sum without changing counts; delete empties group b
    Dml.upsertMor(src, Seq((2L, "a", 5.0)).toDF("k", "g", "v"), Seq("k"))
    Dml.deleteMorKeys(src, Seq(Tuple1(3L)).toDF("k"))
    assert(TableFollow.followAgg(src, dst, Seq("g"), "v").isDefined)
    assert(view == Seq(("a", 2L, 6.5)), "b reached zero rows and must leave the view")
  }

  test("followAgg merges a NULL group key with its existing view row") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = Seq((0L, Option("x"), 0.0)).toDF("k", "g", "v").schema
    val src = GraftTable.create(spark, scratchDir("ivm-null-src"), schema)
    val dst = GraftTable.create(spark, scratchDir("ivm-null-dst"), StructType(Seq(
      StructField("g", StringType), StructField("n_rows", LongType),
      StructField("sum_val", DecimalType(18, 2)))))
    src.append(Seq((1L, Option("a"), 1.0), (2L, Option.empty[String], 2.0))
      .toDF("k", "g", "v"))
    TableFollow.followAgg(src, dst, Seq("g"), "v")
    src.append(Seq((3L, Option.empty[String], 3.0)).toDF("k", "g", "v"))
    TableFollow.followAgg(src, dst, Seq("g"), "v")
    val rows = dst.readLatest().orderBy(asc_nulls_first("g")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSeq
    assert(rows == Seq((None, 2L, 5.0), (Some("a"), 1L, 1.0)),
      s"NULL group must stay ONE group, got $rows")
  }

  test("followAgg counts NULL-valued rows but adds nothing to the sum") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = Seq((0L, "x", Option(0.0))).toDF("k", "g", "v").schema
    val src = GraftTable.create(spark, scratchDir("ivm-nullv-src"), schema)
    val dst = GraftTable.create(spark, scratchDir("ivm-nullv-dst"), StructType(Seq(
      StructField("g", StringType), StructField("n_rows", LongType),
      StructField("sum_val", DecimalType(18, 2)))))
    src.append(Seq((1L, "a", Option(2.0)), (2L, "a", Option.empty[Double]))
      .toDF("k", "g", "v"))
    TableFollow.followAgg(src, dst, Seq("g"), "v")
    // a batch whose values are ALL NULL must not poison the running sum
    src.append(Seq((3L, "a", Option.empty[Double])).toDF("k", "g", "v"))
    TableFollow.followAgg(src, dst, Seq("g"), "v")
    val r = dst.readLatest().collect().map(x =>
      (x.getString(0), x.getLong(1), x.getDecimal(2).doubleValue())).toSeq
    assert(r == Seq(("a", 3L, 2.0)),
      s"NULL values count rows, add nothing: got $r")
  }

  test("concurrent mirrors never double-append a range (real threads)") {
    import spark.implicits._
    val (src, dst) = mkPair("follow-race")
    src.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            var applied = 0
            var retries = 0
            var done = false
            while (!done && retries < 10) {
              try {
                if (TableFollow.follow(src, dst, Seq("k")).isDefined) applied += 1
                done = true
              } catch {
                case _: java.util.ConcurrentModificationException => retries += 1
              }
            }
            assert(done, "mirror starved out")
            applied
          }
        })
      }
      val applies = tasks.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS)).sum
      assert(applies == 1, s"exactly ONE mirror may apply the range, got $applies")
    } finally pool.shutdownNow()
    assert(content(dst) == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"append-only range must land exactly once: ${content(dst)}")
  }

  test("concurrent refreshers never double-apply a delta (real threads)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = Seq((0L, "x", 0.0)).toDF("k", "g", "v").schema
    val src = GraftTable.create(spark, scratchDir("ivm-race-src"), schema)
    val dst = GraftTable.create(spark, scratchDir("ivm-race-dst"), StructType(Seq(
      StructField("g", StringType), StructField("n_rows", LongType),
      StructField("sum_val", DecimalType(18, 2)))))
    src.append(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 4.0)).toDF("k", "g", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            var applied = 0
            var retries = 0
            var done = false
            while (!done && retries < 10) {
              try {
                if (TableFollow.followAgg(src, dst, Seq("g"), "v").isDefined)
                  applied += 1
                done = true
              } catch {
                case _: java.util.ConcurrentModificationException => retries += 1
              }
            }
            assert(done, "refresher starved out")
            applied
          }
        })
      }
      val applies = tasks.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS)).sum
      assert(applies == 1, s"exactly ONE refresher may apply the range, got $applies")
    } finally pool.shutdownNow()
    val r = dst.readLatest().orderBy("g").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDecimal(2).doubleValue())).toSeq
    assert(r == Seq(("a", 2L, 3.0), ("b", 1L, 4.0)),
      s"view must hold exactly one application of the delta: $r")
  }

  test("an expired offset on a non-empty view refuses instead of double-applying") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = Seq((0L, "x", 0.0)).toDF("k", "g", "v").schema
    val src = GraftTable.create(spark, scratchDir("ivm-exp-src"), schema)
    val dst = GraftTable.create(spark, scratchDir("ivm-exp-dst"), StructType(Seq(
      StructField("g", StringType), StructField("n_rows", LongType),
      StructField("sum_val", DecimalType(18, 2)))))
    src.append(Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("k", "g", "v"))
    TableFollow.followAgg(src, dst, Seq("g"), "v")
    // maintenance on the VIEW table pushes the refresh commit out of the
    // retention window — but maintenance commits CARRY the fence, so the
    // offset survives and refreshes stay exactly-once
    graft.maintenance.Maintenance.materializeDeletes(dst)
    graft.maintenance.Maintenance.expireSnapshots(dst, retainLast = 1)
    assert(TableFollow.lastFollowedOffset(dst).isDefined,
      "maintenance commits must carry the follow offset through expiry")
    src.append(Seq((3L, "b", 4.0)).toDF("k", "g", "v"))
    TableFollow.followAgg(src, dst, Seq("g"), "v")
    val r = dst.readLatest().orderBy("g").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDecimal(2).doubleValue())).toSeq
    assert(r == Seq(("a", 2L, 3.0), ("b", 1L, 4.0)),
      s"post-expiry refresh must apply the new range exactly once: $r")
    // a GENUINE offset loss (an outsider append carries no fences, then
    // expiry drops everything else) must refuse, never re-apply history
    dst.append(Seq(("z", 1L, new java.math.BigDecimal("0.00")))
      .toDF("g", "n_rows", "sum_val")
      .select(col("g"), col("n_rows"),
        col("sum_val").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("sum_val")))
    graft.maintenance.Maintenance.expireSnapshots(dst, retainLast = 1)
    assert(TableFollow.lastFollowedOffset(dst).isEmpty, "loss not reproduced")
    src.append(Seq((4L, "b", 5.0)).toDF("k", "g", "v"))
    val e = intercept[IllegalArgumentException] {
      TableFollow.followAgg(src, dst, Seq("g"), "v")
    }
    assert(e.getMessage.contains("no follow offset"),
      s"must refuse, never silently re-apply history as a delta: ${e.getMessage}")
  }

  test("copy-on-write commit in range raises loudly") {
    import spark.implicits._
    val (src, dst) = mkPair("follow-cow")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    Dml.delete(src, col("k") === 1L) // COW: no row-level change tracking
    val e = intercept[IllegalArgumentException] {
      TableFollow.follow(src, dst, Seq("k"))
    }
    assert(e.getMessage.contains("copy-on-write"))
  }
}
