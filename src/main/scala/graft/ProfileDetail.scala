package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only measurement aid (guide §1: measure first): runs named queries
  * through the same noop-sink timing as Bench, but with a listener that
  * counts Spark jobs/stages/tasks and sums task time per run — separating
  * "many tiny jobs" (fixed per-action overhead: iterative rounds,
  * checkpoints, commits) from "few heavy stages" (real compute). Usage:
  *   runMain graft.ProfileDetail <sfDir> <query> [query ...]
  * Never invoked by the driver.
  */
object ProfileDetail {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.queries.Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var gcMs = 0L
    val heavy = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, String)]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        val cs = Option(j.properties).map(p =>
          Option(p.getProperty("callSite.short")).getOrElse("") + " " +
            Option(p.getProperty("spark.job.description")).getOrElse("")).getOrElse("")
        j.stageIds.foreach(id => stageJob.put(id, cs))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
        gcMs += s.stageInfo.taskMetrics.jvmGCTime
        heavy.add((s.stageInfo.taskMetrics.executorRunTime, s.stageInfo.numTasks,
          (s.stageInfo.name.take(60) + " || job: " +
            stageJob.getOrDefault(s.stageInfo.stageId, "?")).take(300)))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm up shared paths once so run1 vs run2 shows residual cold cost
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }

    // machine-speed probe (same shape as Bench's): prints beside each query
    // so a loaded/throttled host is distinguishable from a code change
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(10000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach(_ => calibrate()) // warm the probe

    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L; gcMs = 0L; heavy.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val cal = calibrate()
        Thread.sleep(300) // listener events are async; let the bus drain
        println(f"$name%-28s run$i wall=$wall%7.2fs jobs=$jobs%4d stages=$stages%5d tasks=$tasks%6d taskTime=${taskTimeMs / 1000.0}%8.1fs gc=${gcMs / 1000.0}%6.1fs cal=$cal%.3f")
        if (i == 2 && sys.env.get("PROFILE_STAGES").contains("1")) {
          import scala.jdk.CollectionConverters._
          heavy.asScala.toSeq.sortBy(-_._1).take(8).foreach { case (ms, n, nm) =>
            println(f"    stage ${ms / 1000.0}%7.1fs tasks=$n%4d  $nm")
          }
        }
      }
    }
    spark.stop()
  }
}
