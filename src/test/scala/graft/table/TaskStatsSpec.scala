package graft.table

import graft.SparkSpec

/** Write-task stats collection (VERDICT r8 ask #5): at or past
  * `TaskStatsThresholdProp` files per commit, publication + footer stats run
  * in the write tasks' executors instead of the driver loop. The two sites
  * must produce IDENTICAL file entries — same partition values, row counts,
  * and per-column stats — so the choice is pure cost, never correctness.
  */
class TaskStatsSpec extends SparkSpec {

  private val df = {
    import spark.implicits._
    // p = k/30: each partition file holds a CONTIGUOUS k range, so the
    // task-collected bounds are selective and the prune test can bite
    (0L until 210L).map(k => (k, s"v$k", (k / 30).toString)).toDF("k", "v", "p")
  }

  private def build(prefix: String, threshold: String): GraftTable = {
    val t = GraftTable.create(spark, scratchDir(prefix), df.schema,
      partitionCols = Seq("p"),
      properties = Map(GraftTable.TaskStatsThresholdProp -> threshold))
    t.append(df)
    t
  }

  test("task-collected entries equal driver footer-derived entries") {
    val taskT = build("taskstats-task-", "1")       // every commit takes the job path
    val drvT = build("taskstats-drv-", "1000000")   // pinned to the driver loop
    def shape(t: GraftTable) =
      t.latest.files.map(f => (f.partitionValues, f.rowCount, f.stats))
        .sortBy(_._1.toSeq.sorted.mkString(","))
    assert(shape(taskT) === shape(drvT),
      "task-collected stats diverged from the driver footer sweep")
    // the task path actually recorded usable stats (bounds + null count)
    assert(taskT.latest.files.nonEmpty &&
      taskT.latest.files.forall(f => f.stats.get("k").exists(_.size == 3)))
    // and the published layout reads back identically
    assert(taskT.readLatest().orderBy("k").collect().toSeq ===
      drvT.readLatest().orderBy("k").collect().toSeq)
  }

  test("task-path commits prune and answer metadata queries like driver-path commits") {
    val t = build("taskstats-prune-", "1")
    // footer stats from the task path feed the same planning passes
    val (sel, total) = t.planBetween(t.latest, "k", 0L, 20L)
    assert(sel.size < total, "task-collected bounds must prune")
    assert(t.countRowsFromMetadata().contains(210L))
    assert(t.readBetween("k", 0L, 20L).count() === 21L)
  }
}
