package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Iterative graph analytics over relationship graphs derived from the
  * warehouse (entity-importance scoring for curation and analytics — the
  * iterative-join family that complements the pointer-jumping connected
  * components in `llm.Dedup`).
  *
  * PageRank here is FIXED-POINT: ranks are integer micro-units
  * (SCALE = 1e6) and every step is integer arithmetic — `rank // outdeg`
  * contributions, `(17 * in) // 20` for the 0.85 damping, `150000` for the
  * 0.15 teleport. Floating-point PageRank sums contributions in engine-
  * dependent fold order, so no float formulation can be hash-checked
  * across engines; the fixed-point ladder is bit-identical everywhere
  * while keeping the operator's real shape. Quantization error is bounded
  * by one unit per in-edge per round — ppm-scale against SCALE.
  *
  * Scale shape per round: ranks join edges on src (the edge list is
  * pre-partitioned by src, so only the rank table — one row per node —
  * moves), contributions aggregate on dst with map-side partials, and a
  * `localCheckpoint` cuts lineage (the corpusDedup pattern). O(iters)
  * rounds of two shuffles each; nothing driver-side grows with the graph.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  val Scale = 1000000L

  /** `edges`: directed (src, dst) BIGINT pairs, deduplicated. Every node
    * must appear as a src (feed an undirected graph as both directions);
    * dangling nodes would otherwise leak rank mass silently, so they
    * refuse loudly instead.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      edgesDistinct: Boolean = false): DataFrame = {
    require(iters >= 1, s"pageRank iters must be >= 1, got $iters")
    // The edge list is the BIG side and is needed src-partitioned in every
    // round; partition it ONCE here (localCheckpoint preserves the physical
    // partitioning), so each round's rank join moves only the rank table —
    // one row per node, orders of magnitude smaller than the edges and
    // small enough that Catalyst broadcasts it. `edgesDistinct` lets a
    // caller whose list is deduplicated by construction (e.g. a union of
    // two disjoint direction namespaces) skip a full extra shuffle.
    val e0 = edges.select(col("src").cast("bigint").as("src"),
      col("dst").cast("bigint").as("dst"))
    val e = (if (edgesDistinct) e0 else e0.distinct())
      .repartition(col("src")).localCheckpoint(eager = false)
    // src-partitioned input: the degree agg and its join add no edge shuffle.
    // deg doubles as the NODE SET (one row per src) — deriving srcs from it
    // retires the separate edge-wide distinct the old shape re-ran in every
    // round; the lazy checkpoint materializes under the dangling probe below
    // and every round reuses the cached blocks.
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(eager = false)
    val srcs = deg.select(col("src").as("node"))
    val dangling = e.select(col("dst").as("node")).distinct()
      .join(srcs, Seq("node"), "left_anti").limit(1).collect()
    require(dangling.isEmpty,
      s"pageRank: dangling node ${dangling.head.getLong(0)} has in-edges but " +
        "no out-edges; feed an undirected graph as both directions")
    // EAGER: all `iters` round joins reference withDeg inside the single
    // final job — a lazy cache would race them into recomputing this join
    // per round instead of reading the blocks once.
    val withDeg = e.join(deg, Seq("src")).localCheckpoint(eager = true)
    var ranks = srcs.withColumn("rank", lit(Scale))
    for (round <- 1 to iters) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .withColumn("contrib", expr("rank div outdeg"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("contrib")).as("insum"))
      ranks = srcs.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(Scale * 15L / 100L) +
            expr("(17 * coalesce(insum, 0L)) div 20")).as("rank"))
      // intermediate rounds checkpoint LAZILY (lineage still cut at the RDD
      // — Catalyst plans stay one-round deep) but materialize together under
      // the consumer's single action: ranks are exact integers, so fold
      // order never matters, and one job of O(iters) stages beats one eager
      // job per round. The final round keeps its plan so consumers compose
      // and plan audits see the round's shape.
      if (round < iters) ranks = ranks.localCheckpoint(eager = false)
    }
    ranks
  }

  /** Undirected customer↔supplier trade graph: an edge per distinct
    * (customer, supplier) pair that shares an order, node ids namespaced by
    * parity (customer 2k, supplier 2k+1).
    */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  val queries: Map[String, Q] = Map(
    // Fixed-point PageRank, 5 rounds over the trade graph — per-node exact
    // integer ranks, fully DuckDB-checked (the oracle unrolls the rounds)
    "graph_pagerank" -> ((s, dir) =>
      // the two direction namespaces are disjoint and each side is distinct
      // by construction → edgesDistinct skips the redundant dedup shuffle
      pageRank(tradeEdges(s, dir), iters = 5, edgesDistinct = true)
        .orderBy(col("rank").desc, col("node")).limit(100)),

    // Degree profile of the same graph (the skew diagnostic you run before
    // any iterative graph job) — exact, DuckDB-checked
    "graph_degrees" -> ((s, dir) =>
      tradeEdges(s, dir).groupBy("src").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree"))
  )

  private val EdgesSql =
    """edges AS (
         SELECT src, dst FROM (
           SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
         UNION
         SELECT dst, src FROM (
           SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey)),
       nodes AS (SELECT DISTINCT src AS node FROM edges),
       deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1)"""

  private def prRound(k: Int): String =
    s"""r$k AS (
          SELECT n.node,
                 CAST(150000 + (17 * COALESCE(s.c, 0)) // 20 AS BIGINT) AS rank
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, SUM(r${k - 1}.rank // d.outdeg) AS c
            FROM edges e
            JOIN r${k - 1} ON r${k - 1}.node = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst) s USING (node))"""

  val oracle: Map[String, String] = Map(
    "graph_pagerank" ->
      (s"""WITH $EdgesSql,
          r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
          ${(1 to 5).map(prRound).mkString(",\n")}
          SELECT node, rank FROM r5
          ORDER BY rank DESC, node LIMIT 100"""),
    "graph_degrees" ->
      s"""WITH $EdgesSql
         SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM (
           SELECT src, COUNT(*) AS degree FROM edges GROUP BY 1)
         GROUP BY degree ORDER BY degree"""
  )
}
