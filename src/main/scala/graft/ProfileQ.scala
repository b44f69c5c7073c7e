package graft
import org.apache.spark.sql.SparkSession
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.queries.Tables.configure(SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
