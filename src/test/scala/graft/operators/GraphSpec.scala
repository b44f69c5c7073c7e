package graft.operators

import graft.SparkSpec

/** Fixed-point PageRank semantics on hand-computed graphs. */
class GraphSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("src", "dst")
  }

  test("a symmetric cycle is a fixed point at SCALE") {
    val e = edges((1L, 2L), (2L, 1L))
    val out = Graph.pageRank(e, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 150000 + (17 * 1000000) div 20 = 1000000 exactly
    assert(out == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("star hub accumulates leaf mass; integer ladder matches hand-computed values") {
    // undirected star: hub 10 <-> leaves 1,2,3
    val e = edges((10L, 1L), (10L, 2L), (10L, 3L),
      (1L, 10L), (2L, 10L), (3L, 10L))
    val out = Graph.pageRank(e, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hub: 150000 + (17 * 3000000) div 20 = 2700000
    // leaf: 150000 + (17 * (1000000 div 3)) div 20 = 433333
    assert(out(10L) == 2700000L)
    assert(Seq(1L, 2L, 3L).forall(out(_) == 433333L))
  }

  test("a dangling node refuses loudly") {
    val e = edges((1L, 2L)) // 2 has no out-edges
    val ex = intercept[IllegalArgumentException](Graph.pageRank(e, iters = 1))
    assert(ex.getMessage.contains("dangling"))
  }
}
