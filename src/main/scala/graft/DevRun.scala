package graft
import org.apache.spark.sql.SparkSession

// Temporary dev runner — not committed.
object DevRun {
  def main(args: Array[String]): Unit = {
    val spark = graft.queries.Tables.configure(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
      df.show(20, truncate = false)
      println(f"[devrun] $name took ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
