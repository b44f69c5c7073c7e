package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-plan shape through the snapshot read path: the table's reads are
  * assembled from per-epoch parquet scans under unions, evolution replays,
  * and MOR anti-joins — none of which may break Catalyst's column pruning or
  * filter pushdown. A scan that reads all columns for a 2-column aggregate
  * is the difference between a 2-column and a full-width pass at 100 TB, so
  * the contract is asserted on the executed plan, not assumed.
  */
class PlanShapeSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    // AQE wraps the physical plan; the pre-execution initialPlan carries the
    // scans (requiredSchema/pushdown are fixed at planning, before any
    // runtime re-optimization)
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        unwrap(a.initialPlan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    unwrap(df.queryExecution.executedPlan)
  }

  private def mkTable(name: String, commits: Int = 2): GraftTable = {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"c${i % 4}", i * 1.5, s"pad-$i", i % 7))
      .toDF("id", "category", "amount", "payload", "bucket")
    val t = GraftTable.create(spark, scratchDir(name), df.schema)
    (1 to commits).foreach(_ => t.append(df))
    t
  }

  test("a 2-column aggregate reads only those columns from parquet") {
    val t = mkTable("shape-prune")
    val agg = t.readLatest().groupBy("category").agg(sum("amount").as("s"))
    val ss = scans(agg)
    assert(ss.nonEmpty, "no parquet scan found under the aggregate")
    ss.foreach { s =>
      val read = s.requiredSchema.fieldNames.toSet
      assert(read == Set("category", "amount"),
        s"scan read $read for a (category, amount) aggregate — column pruning broke")
    }
  }

  test("a filter on the read pushes into the parquet scan") {
    val t = mkTable("shape-push")
    val q = t.readLatest().filter(col("id") === 7L).select("id", "amount")
    val ss = scans(q)
    assert(ss.nonEmpty)
    ss.foreach { s =>
      assert(s.dataFilters.nonEmpty,
        "the id=7 predicate did not reach the parquet scan (no data filters)")
      assert(s.requiredSchema.fieldNames.toSet == Set("id", "amount"))
    }
  }

  test("column pruning survives evolution replay across epochs") {
    import spark.implicits._
    val t = mkTable("shape-evo", commits = 1)
    t.addColumn("extra", "double", "0.5")
    t.append((1L to 50L).map(i => (i, s"c${i % 4}", i * 2.0, s"p-$i", i % 7, 1.0))
      .toDF("id", "category", "amount", "payload", "bucket", "extra"))
    // two epochs (pre/post evolution) → a union of two scans; each must
    // still prune to the aggregate's columns (+ the replayed default, which
    // exists only in the plan, not the old files)
    val agg = t.readLatest().groupBy("category").agg(sum("extra").as("s"))
    val ss = scans(agg)
    assert(ss.size >= 2, s"expected per-epoch scans, got ${ss.size}")
    ss.foreach { s =>
      val read = s.requiredSchema.fieldNames.toSet
      assert(read.subsetOf(Set("category", "extra")),
        s"scan read $read for a (category, extra) aggregate across evolution")
    }
  }

  test("llm candidate joins stay broadcast-hash; no cartesian product anywhere") {
    val sf = "/root/testdata/sf0.001"
    val pairs = graft.llm.Similarity.embeddingContamination(
      graft.queries.Tables.embeddings(spark, sf), threshold = 0.3)
    def nodes(df: DataFrame): Seq[String] = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
        p.nodeName +: (p.children.flatMap(walk) ++ (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.initialPlan)
          case _ => Nil
        }))
      walk(df.queryExecution.executedPlan)
    }
    val ns = nodes(pairs)
    assert(!ns.exists(_.contains("CartesianProduct")),
      s"contamination plan contains a cartesian product: $ns")
    assert(ns.exists(_.contains("BroadcastHashJoin")),
      s"benchmark side did not broadcast: $ns")
    // n-gram decontamination: benchmark gram set broadcasts too
    val report = graft.llm.Decontaminate.contaminationReport(
      graft.queries.Tables.documents(spark, sf).filter(col("doc_id") % 17 =!= 0),
      graft.queries.Tables.documents(spark, sf).filter(col("doc_id") % 17 === 0), n = 5)
    val rns = nodes(report)
    assert(!rns.exists(_.contains("CartesianProduct")))
    assert(rns.exists(n => n.contains("BroadcastHashJoin") || n.contains("BroadcastNestedLoopJoin")),
      s"decontamination benchmark set did not broadcast: $rns")
  }

  test("j6 star join: both dims broadcast, exactly one shuffle (the rollup)") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.queries.RelationalQueries.queries("j6_star_join")(spark, sf)
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children.flatMap(walk) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.initialPlan)
        case _ => Nil
      }))
    val plan = walk(df.queryExecution.executedPlan)
    val broadcasts = plan.count(_.nodeName.contains("BroadcastHashJoin"))
    assert(broadcasts === 2,
      s"star join must broadcast BOTH dims, found $broadcasts broadcast joins")
    assert(!plan.exists(_.nodeName.contains("SortMergeJoin")),
      "a dim join fell back to sort-merge — that's a fact-sized shuffle")
    assert(!plan.exists(_.nodeName.contains("CartesianProduct")))
    // the only exchanges are the group-by rollup (and the final orderBy's
    // range exchange) — the fact table itself is never hash-repartitioned
    // for a join
    val exchanges = plan.filter(p => p.nodeName.contains("Exchange") &&
      !p.nodeName.contains("Broadcast"))
    assert(exchanges.size <= 2,
      s"expected only the rollup + sort exchanges, got: ${exchanges.map(_.nodeName)}")
    // and the fact scan prunes to the join keys + filter + agg inputs
    val factScan = scans(df).find(_.requiredSchema.fieldNames.contains("l_extendedprice"))
    assert(factScan.isDefined, "no lineitem scan found")
    assert(factScan.get.requiredSchema.fieldNames.toSet ==
      Set("l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"),
      s"fact scan read ${factScan.get.requiredSchema.fieldNames.toSet}")
  }

  test("j7 snowflake join: dims broadcast, facts pruned, date filter pushed") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.queries.RelationalQueries.queries("j7_local_supplier")(spark, sf)
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children.flatMap(walk) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.initialPlan)
        case _ => Nil
      }))
    val plan = walk(df.queryExecution.executedPlan)
    assert(!plan.exists(_.nodeName.contains("CartesianProduct")))
    // region->nation, nations->customer, supplier->lineitem all broadcast
    assert(plan.count(_.nodeName.contains("BroadcastHashJoin")) >= 3,
      s"expected the three dim joins to broadcast: ${plan.map(_.nodeName).distinct}")
    // scale-invariant contracts: both fact scans prune to exactly the
    // needed columns, and the date range reaches the orders scan
    val li = scans(df).find(_.requiredSchema.fieldNames.contains("l_extendedprice"))
    assert(li.isDefined && li.get.requiredSchema.fieldNames.toSet ==
      Set("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
      s"lineitem scan read ${li.map(_.requiredSchema.fieldNames.toSet)}")
    val ord = scans(df).find(_.requiredSchema.fieldNames.contains("o_orderdate"))
    assert(ord.isDefined && ord.get.requiredSchema.fieldNames.toSet ==
      Set("o_orderkey", "o_custkey", "o_orderdate"),
      s"orders scan read ${ord.map(_.requiredSchema.fieldNames.toSet)}")
    assert(ord.get.metadata("PushedFilters").contains("o_orderdate"),
      s"date range not pushed: ${ord.get.metadata.get("PushedFilters")}")
  }

  test("novelty: the gram stream aggregates once and is never joined back") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val exec = graft.llm.Decontaminate.noveltyReport(docs)
      .queryExecution.executedPlan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children.flatMap(walk) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.initialPlan)
        case _ => Nil
      }))
    val plan = walk(exec)
    assert(!plan.exists(_.nodeName.contains("CartesianProduct")))
    // every join keys on doc_id; none may carry the gram column (a
    // gram-keyed join would mean the exploded stream was joined back)
    val joins = plan.filter(_.nodeName.contains("Join"))
    assert(joins.nonEmpty)
    assert(joins.forall(j => !j.simpleString(200).contains("gram#")),
      s"a join carries the gram stream:\n${joins.map(_.simpleString(200)).mkString("\n")}")
  }

  test("token-budget mixture: one corpus agg, planning arithmetic broadcast") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = graft.llm.Sampling.tokenBudgetMixture(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"the one-row weight total must broadcast:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"weight total should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the O(sources) planning should sort-merge:\n$plan")
  }

  test("semantic dedup: map-only assignment, verify join stays equi") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.llm.Similarity.semanticDedup(
      graft.queries.Tables.embeddings(spark, sf), threshold = 0.4)
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.nodeName +: (p.children.flatMap(nodes) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.initialPlan)
        case _ => Nil
      }))
    val ns = nodes(df.queryExecution.executedPlan)
    // assignment folds over the literal centroid array — no join of any
    // kind feeds it (the only joins in the plan are the CELL-LOCAL verify
    // and the final flag attach, which must be hash equi-joins), no window
    // ranks candidates, and nothing may cartesian
    assert(!ns.exists(n => n.contains("BroadcastNestedLoopJoin") ||
      n.contains("CartesianProduct") || n.contains("Window")),
      s"assignment is not the map-only fold: $ns")
    assert(ns.exists(n => n.contains("SortMergeJoin") || n.contains("ShuffledHashJoin") ||
      n.contains("BroadcastHashJoin")),
      s"cell-local verify is not an equi-join: $ns")
  }

  test("pagerank round: contribution agg is partial, no cartesian, edges equi-join") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.operators.Graph.pageRank(
      spark.range(1, 50).selectExpr("id AS src", "(id % 7) + 100 AS dst")
        .union(spark.range(1, 50).selectExpr("(id % 7) + 100 AS src", "id AS dst")),
      iters = 1)
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.nodeName +: (p.children.flatMap(nodes) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.initialPlan)
        case _ => Nil
      }))
    val ns = nodes(df.queryExecution.executedPlan)
    assert(!ns.exists(_.contains("CartesianProduct")),
      s"pagerank plan contains a cartesian product: $ns")
    // rank-x-edges and the final rank attach must be equi-joins
    assert(ns.exists(n => n.contains("HashJoin") || n.contains("SortMergeJoin")),
      s"pagerank joins are not equi-joins: $ns")
    // the per-dst contribution sum combines map-side before the shuffle
    def collectAggs(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.aggregate.HashAggregateExec] =
      (p match {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => Seq(h)
        case _ => Nil
      }) ++ p.children.flatMap(collectAggs) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          collectAggs(a.initialPlan)
        case _ => Nil
      })
    val aggs = collectAggs(df.queryExecution.executedPlan)
    assert(aggs.exists(_.aggregateExpressions.exists(_.mode ==
      org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
      "contribution aggregation has no map-side partial")
    // kmeans: assignment is genuinely MAP-ONLY — the centroid set rides the
    // plan as a literal array and the argmax is a per-row fold, so the final
    // assignment has NO exchange, NO join, NO window between the corpus
    // scan and the output (VERDICT r14 #1: the broadcast-join + window form
    // shuffled all k×N exploded candidate rows)
    val km = graft.llm.Similarity.kmeans(
      graft.queries.Tables.embeddings(spark, sf), iters = 2)
    val kns = nodes(km.queryExecution.executedPlan)
    assert(!kns.exists(n => n.contains("Exchange") || n.contains("Join") ||
      n.contains("Window") || n.contains("CartesianProduct")),
      s"kmeans assignment is not map-only: $kns")
    // same shape for semanticDedup's assignment stage (the verify join that
    // follows is cell-local and allowed to shuffle; the ASSIGNMENT input to
    // it must not re-shuffle embeddings by vec_id)
    val sd = graft.llm.Similarity.assignNearest(
      graft.queries.Tables.embeddings(spark, sf),
      spark.range(0, 2).selectExpr("CAST(id AS STRING) AS cell",
        "array_repeat(CAST(id AS DOUBLE) + 0.1, 64) AS centroid"))
    val sns = nodes(sd.queryExecution.executedPlan)
    assert(!sns.exists(n => n.contains("Exchange") || n.contains("Join") ||
      n.contains("Window")),
      s"assignNearest is not map-only: $sns")
  }

  test("the SQL-bridge view keeps scan-level column pruning") {
    val t = mkTable("shape-sql")
    val eng = new graft.plan.SparkSqlEngine(spark)
    eng.registerGraftTable("shaped", t)
    // the engine's own read path (registered snapshot view + metadata prune
    // pass) — the shape a user's SQL actually executes
    val df = spark.sql("SELECT category, SUM(amount) AS s FROM shaped GROUP BY category")
    val ss = scans(df)
    assert(ss.nonEmpty)
    ss.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet == Set("category", "amount"),
        s"SQL view scan read ${s.requiredSchema.fieldNames.toSet}")
    }
  }
}
