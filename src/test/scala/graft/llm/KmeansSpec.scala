package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `Similarity.kmeans` (Lloyd rounds) and `Sampling.clusterBalancedSample`.
  * The sweep entries are oracle-checked per row; this pins (a) that Lloyd
  * actually reassigns mislabeled vectors away from their seed cells, and
  * (b) the cross-engine safety margin: the oracle replays assignment with
  * DuckDB-computed centroids, whose components differ from Spark's by
  * fold-order ulps — every per-round top1-top2 margin must dwarf that.
  */
class KmeansSpec extends SparkSpec {

  private def emb(rows: (Long, Int, Seq[Double])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "label", "embedding")
  }

  test("Lloyd rounds recover true clusters from mixed seed labels") {
    // x-axis cluster ids 1-3, y-axis cluster ids 4-6; labels are MIXED so
    // the seed centroids are polluted mixtures — assignment must ignore
    // the labels and split by geometry.
    val corpus = emb(
      (1L, 0, Seq(1.0, 0.05, 0.0)),
      (2L, 0, Seq(0.98, 0.0, 0.02)),
      (3L, 1, Seq(1.0, 0.0, 0.05)),
      (4L, 1, Seq(0.0, 1.0, 0.03)),
      (5L, 1, Seq(0.02, 0.97, 0.0)),
      (6L, 0, Seq(0.0, 1.0, 0.01)))
    val out = Similarity.kmeans(corpus, iters = 2)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(4L) == out(5L) && out(5L) == out(6L))
    assert(out(1L) != out(4L))
    // and the result genuinely differs from the seed labels (3 and 6 moved)
    assert(out(3L) == out(1L) && out(6L) == out(4L))
  }

  private def minMargin(corpus: DataFrame, centroids: DataFrame): Double =
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", Similarity.cosine(col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell"))))
      .filter(col("rn") <= 2)
      .groupBy("vec_id").agg((max(col("csim")) - min(col("csim"))).as("margin"))
      .agg(min(col("margin"))).head.getDouble(0)

  test("per-round assignment margins on the test corpus dwarf fold-order noise") {
    val corpus = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rounds = Similarity.kmeansCentroidRounds(corpus, iters = 2)
    rounds.zipWithIndex.foreach { case (cent, i) =>
      val m = minMargin(corpus, cent)
      assert(m > 1e-6,
        s"round ${i + 1} min top1-top2 margin $m is inside float fold-order " +
          "noise; the oracle's DuckDB-side centroid replay could flip an " +
          "assignment — re-examine before trusting the hash check")
    }
  }

  test("cluster-balanced sample caps every cell and ignores input order") {
    val corpus = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val assigned = Similarity.kmeans(corpus, iters = 1)
    val kept = Sampling.clusterBalancedSample(assigned, "vec_id", "cell", cap = 5)
    val sizes = kept.groupBy("cell").count().collect().map(_.getLong(1))
    assert(sizes.nonEmpty && sizes.forall(_ <= 5L))
    // deterministic under arbitrary input partitioning/order
    val keptShuffled = Sampling.clusterBalancedSample(
      assigned.repartition(7, col("vec_id")), "vec_id", "cell", cap = 5)
    assert(kept.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq ==
      keptShuffled.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq)
  }
}
