package graft
import org.apache.spark.sql.SparkSession

// Temporary dev runner — not committed.
object DevRun {
  def main(args: Array[String]): Unit = {
    val spark = graft.queries.Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (t <- Seq("documents", "embeddings", "orders", "lineitem", "events")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"[devrun] $t rows=${df.count()} scanParts=${df.rdd.getNumPartitions}")
    }
    spark.stop()
  }
}
