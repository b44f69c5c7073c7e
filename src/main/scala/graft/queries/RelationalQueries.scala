package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's read-query surface (SURVEY.md §2.1-§2.6, §2.11) re-expressed
  * as declarative DataFrame plans. Every entry has a DuckDB oracle; aggregates
  * over doubles are cast to DECIMAL before summing so the result is exact and
  * order-independent (a distributed sum must not depend on partial-aggregation
  * order). The FINAL output is cast decimal→DOUBLE on both sides: the exact
  * decimal is int64-representable at these magnitudes, so the double cast is
  * the identical correctly-rounded value in Spark and DuckDB, while a decimal
  * output would hash-differ on trailing-zero string forms ("49998.00" vs a
  * float-normalized "49998.0").
  *
  * Scale notes: all aggregations are partial (map-side combine) by
  * construction; filters and projections sit directly on the scan so parquet
  * pushdown/pruning applies; the one dimension join broadcasts the small side.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  // Hash-stable guarded formatting shared across query files — see Fmt.
  private def dec(c: org.apache.spark.sql.Column) = Fmt.dec(c)
  private def dbl(c: org.apache.spark.sql.Column) = Fmt.dbl(c)

  val queries: Map[String, Q] = Map(
    // S1/P1/O1 — projection + global sort + limit
    // (ref sql/spark/open_catalog/read_sales_events.sql:3-8)
    "s1_scan_projection" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(500)),

    // P2 — equality predicate point read (ref update_sales_events.sql:5)
    "p2_point_lookup" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") === 42L)
        .select("event_id", "user_id", "event_type", "value")),

    // P3 + A3 — pruned 2-day window group-by count; the range predicate hits
    // the raw ns column so it reaches the scan (ref blob-dfs_bench.py:117-122)
    "p3_pruned_window_agg" -> ((s, dir) =>
      Tables.eventsBetween(s, dir, "2024-01-05 00:00:00", "2024-01-07 00:00:00")
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // P4 — IN-list point lookup (ref blob_dfs/blob-dfs_bench.py:132-136)
    "p4_inlist_lookup" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("user_id").isin(17L, 41L, 89L))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")),

    // P5 — string equality predicate (ref snowflake.sql:399-401)
    "p5_string_predicate" -> ((s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
        .limit(200)),

    // A1 — COUNT(*) scalar (ref read_sales_events.sql:3-4)
    "a1_count" -> ((s, dir) =>
      Tables.lineitem(s, dir).agg(count(lit(1)).as("row_count"))),

    // A2 — checksum aggregates (ref read_checksums.sql:3-7): exact decimal sums
    "a2_checksums" -> ((s, dir) =>
      Tables.lineitem(s, dir).agg(
        count(lit(1)).as("row_count"),
        dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
        dbl(sum(dec(col("l_extendedprice")) * dec(col("l_quantity")))).as("revenue"))),

    // A4 — group-by percentile; exact `percentile` so the oracle can match
    // (ref blob_dfs/blob-dfs_bench.py:125-129 uses approx_percentile — that
    // variant is registered rows-only as a4_approx_percentile below)
    "a4_percentile_value" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(round(expr("percentile(value, 0.95)"), 4).as("p95"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // A4' — the reference's literal operator; approximate, so rows-only check
    "a4_approx_percentile" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(round(percentile_approx(col("value"), lit(0.95), lit(10000)), 4).as("p95"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // A6 — exact + approximate distinct counting (beyond-reference: a
    // training pipeline counts distinct users/docs constantly; HLL is the
    // scale path, exact is the oracle)
    "a6_count_distinct" -> ((s, dir) =>
      Tables.events(s, dir).agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"))),

    "a6_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir).agg(
        approx_count_distinct(col("user_id"), 0.01).as("n_users_approx"))),

    // A5 — re-aggregation of a grouped result (ref blob-dfs_bench.py:112)
    "a5_reaggregation" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("total_events"))),

    // O2 — top-1 by timestamp (ref bulk_insert_sales_events.sql:14-17);
    // o_orderkey tiebreak keeps it deterministic under date collisions
    "o2_top1_latest" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(1)),

    // O3 — plain limit made deterministic by key order (ref snowflake.sql:229)
    "o3_limit" -> ((s, dir) =>
      Tables.orders(s, dir).orderBy("o_orderkey").limit(10)),

    // F5 — arithmetic inside aggregation (ref read_checksums.sql:6). The
    // product of two scale-2 decimals has scale 4; the output keeps scale 4 so
    // no engine-dependent rounding (half-up vs half-even) ever applies.
    "f5_arithmetic_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast(DecimalType(18, 4)).cast("double").as("net_revenue"))
        .orderBy("l_orderkey")
        .limit(100)),

    // F6 — timestamp → date cast (ref bulk_insert_sales_events.sql:4-11)
    "f6_date_cast" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts").cast("date").as("ds"))
        .orderBy("event_id")
        .limit(200)),

    // F7 — CURRENT_TIMESTAMP, used deterministically: all test data predates now
    // (ref sql/databricks/unity_catalog/bulk_insert_sales_events.sql:16-18)
    "f7_current_timestamp" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("ts") < current_timestamp())
        .agg(count(lit(1)).as("n_past"))),

    // F10 — semi-structured extraction: schema'd JSON parse of the events
    // `props` column (from_json stays codegen'd; the parsed field feeds a
    // regular aggregate, so the JSON path rides the scan like any projection)
    "f10_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", expr("from_json(props, 'k BIGINT').k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_parsed"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // F11 — edit-distance fuzzy matching over the nation dimension (a
    // 25x25 self-comparison: exact-pairwise is the declared correctness
    // scope — fuzzy joins over large tables need a blocking key first,
    // exactly like the q-gram/LSH dedup paths)
    "f11_fuzzy_match" -> ((s, dir) => {
      val a = Tables.nation(s, dir).select(col("n_nationkey").as("id_a"),
        col("n_name").as("name_a"))
      val b = Tables.nation(s, dir).select(col("n_nationkey").as("id_b"),
        col("n_name").as("name_b"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 4)
        .select("id_a", "id_b", "dist")
        .orderBy("id_a", "id_b")
    }),

    // F12 — UNPIVOT (wide metrics to long): per-returnflag quantity and
    // price sums melted into (flag, metric, value) rows via stack()
    "f12_unpivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(dbl(sum(dec(col("l_quantity")))).as("qty"),
          dbl(sum(dec(col("l_extendedprice")))).as("price"))
        .select(col("l_returnflag"),
          expr("stack(2, 'qty', qty, 'price', price) AS (metric, value)"))
        .orderBy("l_returnflag", "metric")),

    // F8 — typed NULL column (ref sql/snowflake/open_catalog/bulk_insert_sales_events.sql:17)
    "f8_typed_null" -> ((s, dir) =>
      Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"),
          lit(null).cast("string").as("channel"))
        .orderBy("n_nationkey")
        .limit(5)),

    // Join + agg over dims — revenue by nation; nation/customer broadcast
    // (beyond-reference coverage; the scale-correct shape for dim joins)
    "j3_join_agg_revenue" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dbl(sum(dec(col("o_totalprice")))).as("total_revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name")),

    // Anti join — customers with no orders
    "j4_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_customers_no_orders"))
    }),

    // J6 — TPC-DS-subset star join (spec ICEBERG-Interoperability-Test-
    // Spec.md:43: store_sales x item x date_dim @100 GB): fact lineitem
    // date-filtered, joined to TWO dims in one stage. Both dims broadcast
    // (they are orders-of-magnitude smaller than the fact and the filter
    // cannot grow them), so the only shuffle in the plan is the final
    // group-by rollup — the shape a 100 TB star query must keep.
    // PlanShapeSpec pins both broadcasts and the single shuffle.
    "j6_star_join" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_brand", "s_nationkey")
        .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
            "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)")
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand", "s_nationkey")),

    // J7 — TPC-H Q5-shaped local-supplier join (spec
    // ICEBERG-Interoperability-Test-Spec.md:43 names the TPC-DS star
    // family; this is its 6-table snowflake sibling): region→nation filter
    // broadcast onto customer, date-pruned orders shuffle-joined to
    // customers on custkey, lineitem joined to the broadcast supplier dim,
    // then ONE fact-fact shuffle on orderkey carrying the local-supplier
    // condition (s_nationkey = c_nationkey). Revenue in exact DECIMAL,
    // cast to double last — bit-identical to the DuckDB oracle.
    "j7_local_supplier" -> ((s, dir) => {
      val asiaNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val co = ord.join(cust, col("o_custkey") === col("c_custkey"))
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(co, col("l_orderkey") === col("o_orderkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
            "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)")
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // W1 — window ranking (beyond-reference: the reference has no OVER()
    // clauses, but a complete analytical surface needs them): top-3 orders
    // per customer market segment by price
    "w1_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rnk")
    }),

    // W2 — HAVING-style post-aggregation filter
    "w2_having" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_items"),
          dbl(sum(dec(col("l_quantity")))).as("total_qty"))
        .filter(col("n_items") >= 8)
        .orderBy("l_partkey")),

    // W8 — cumulative running totals per user (the classic analytic
    // window): partitioned by user so every partition sorts in parallel;
    // sums run in exact DECIMAL so the cumulative column is replayable
    // bit-for-bit regardless of accumulation order
    "w8_running_total" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("user_id") < 10)
        .withColumn("running_value", dbl(sum(dec(col("value"))).over(w)))
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    }),

    // Error-tolerant ingestion parsing: TRY_CAST over a dirty string column
    // — malformed values land NULL instead of failing the job (the schema-
    // on-read coercion shape every raw-data ingest needs). Counts parsed /
    // failed per event type; map-only, codegen'd.
    "f14_try_cast" -> ((s, dir) =>
      Tables.events(s, dir)
        // every 7th row carries a non-numeric value — the deterministic
        // dirty-data mix that makes the tolerant-parse path observable
        .withColumn("raw", when(col("event_id") % 7 === 0, col("event_type"))
          .otherwise(regexp_extract(col("props"), "[0-9]+", 0)))
        .withColumn("parsed", expr("try_cast(raw AS BIGINT)"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("parsed").isNotNull, 1L).otherwise(0L)).as("n_parsed"),
          sum(coalesce(col("parsed"), lit(0L))).as("parsed_sum"))
        .orderBy("event_type")),

    // Equi-width histogram of the value column (the profiling pass before
    // choosing quality thresholds): bucket = floor arithmetic against the
    // global min/max — a one-row broadcast from a first agg, then a map-only
    // bucketing pass and a small rollup. No width_bucket builtin needed, so
    // the formulation is engine-portable and exact.
    "a8_histogram" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val bounds = ev.agg(min("value").as("lo"), max("value").as("hi"))
      val nb = 10
      ev.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          least(greatest(floor((col("value") - col("lo")) * nb /
            (col("hi") - col("lo"))), lit(0)), lit(nb - 1)).cast("bigint"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("bucket")
    }),

    // Moving-window aggregate (beyond-reference like w1-w3): 3-row sliding
    // sum/count per user in exact DECIMAL over a deterministic (ts,
    // event_id) frame — ROWS frames are the monitoring/rolling-metric
    // surface UNBOUNDED running totals (w8) don't cover. Per-user window
    // partitions sort in parallel; nothing global moves.
    "w9_moving_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("user_id") < 10)
        .withColumn("moving_sum", dbl(sum(dec(col("value"))).over(w)))
        .withColumn("n_in_frame", count(lit(1)).over(w))
        .select("user_id", "event_id", "moving_sum", "n_in_frame")
        .orderBy("user_id", "event_id")
    }),

    // Referential-integrity audit (the data-quality gate a warehouse runs
    // before publishing): per relationship, how many child rows point at a
    // missing parent. Anti-joins against broadcast parents; exact counts.
    "dq_referential" -> ((s, dir) => {
      import s.implicits._
      val orphanOrders = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"), "left_anti").count()
      val orphanLines = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"), "left_anti").count()
      val orphanSupp = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey"), "left_anti").count()
      // a deliberately stale parent snapshot (customers below 1000 only)
      // proves the counter actually counts — healthy relationships above
      // read zero on this consistent corpus
      val staleSnapshot = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).filter(col("c_custkey") < 1000),
          col("o_custkey") === col("c_custkey"), "left_anti").count()
      Seq(("lineitem->orders", orphanLines),
        ("lineitem->supplier", orphanSupp),
        ("orders->customer", orphanOrders),
        ("orders->customer_stale", staleSnapshot))
        .toDF("relationship", "orphan_rows")
        .orderBy("relationship")
    }),

    // F13 — regex extraction (log/field parsing surface): pull the numeric
    // id out of the JSON-ish props string without a JSON parser; both
    // engines run the same RE2-safe pattern
    "f13_regex_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k_str", regexp_extract(col("props"), "\"k\"\\s*:\\s*(-?\\d+)", 1))
        .filter(col("k_str") =!= "")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_matched"),
          sum(col("k_str").cast("bigint")).as("sum_k"))
        .orderBy("event_type")),

    // W3 — conditional (pivot-style) aggregation
    "w3_conditional_agg" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
        .orderBy("o_orderpriority")),

    // A7 — statistical aggregates (stddev/variance/corr/covar): one-pass
    // co-moment aggregation, map-side partial like any algebraic agg. The
    // 5-decimal rounds absorb the engines' partition-fold-order ulps
    // (relative error ~1e-12 against a 5e-6 boundary distance).
    "a7_stats_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(stddev_samp(col("l_quantity")), 5).as("sd_qty"),
          round(var_samp(col("l_discount")), 5).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 5).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 5).as("cov_qty_disc"))
        .orderBy("l_returnflag")),

    // W6 — NTILE decile report per order priority: the window partitions
    // on o_orderpriority, so every partition sorts independently in
    // parallel (an UNpartitioned ntile would move the whole table to one
    // task — Spark's single-partition global window — which is why a
    // GLOBAL decile report at 100 TB is instead computed from percentile
    // boundaries broadcast over a map-only bucketing pass, never ntile).
    // Ranks tie-break on o_orderkey so bucket membership is deterministic.
    "w6_ntile_deciles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("decile", ntile(10).over(w))
        .groupBy("o_orderpriority", "decile")
        .agg(count(lit(1)).as("n_orders"),
          dbl(sum(dec(col("o_totalprice")))).as("total_price"))
        .orderBy("o_orderpriority", "decile")
    }),

    // W7 — GLOBAL decile report the scale-correct way: exact decile
    // boundaries from one percentile aggregation (a single row), broadcast
    // back over a map-only bucketing pass, then a 10-row rollup — no
    // global sort, no single-task window. Ties sit on the boundary's low
    // side (strict >) identically in both engines.
    "w7_global_deciles" -> ((s, dir) => {
      val bs = Tables.orders(s, dir)
        .agg(expr("percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
          .as("bs"))
      Tables.orders(s, dir)
        .crossJoin(broadcast(bs))
        .withColumn("decile",
          (lit(1) + size(filter(col("bs"), b => col("o_totalprice") > b))).cast("int"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_orders"),
          dbl(sum(dec(col("o_totalprice")))).as("total_price"))
        .orderBy("decile")
    }),

    // W4 — ROLLUP subtotals (multi-level aggregate: Spark's Expand node
    // replicates each input row once per grouping set BEFORE the shuffle,
    // so partial aggregation still combines map-side and the plan stays
    // one exchange — the 100 TB-safe shape for subtotal reports).
    // grouping_id() disambiguates a genuine NULL key from a subtotal row.
    "w4_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_items"),
          dbl(sum(dec(col("l_quantity")))).as("total_qty"),
          grouping_id().as("gid"))
        .orderBy("gid", "l_returnflag", "l_linestatus")),

    // W5 — CUBE over two independent dimensions
    "w5_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          dbl(sum(dec(col("o_totalprice")))).as("total_price"),
          grouping_id().as("gid"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority")),

    // S2 — deterministic synthetic range source
    // (ref blob_dfs/blob-dfs_bench.py:48-65); every column including the
    // hash-derived `amount` is a pure function of user_id, so the FULL
    // table is oracle-checked
    "s2_synth_range" -> ((s, _) =>
      graft.gen.Synthesize.txEvents(s, 1000)
        .select("user_id", "ts", "city", "category")
        .orderBy("user_id")),

    "s2_synth_full" -> ((s, _) =>
      graft.gen.Synthesize.txEvents(s, 1000).orderBy("user_id"))
  )

  val oracle: Map[String, String] = Map(
    "s1_scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
         FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""",
    "p2_point_lookup" ->
      """SELECT event_id, user_id, event_type, value FROM events WHERE event_id = 42""",
    "p3_pruned_window_agg" ->
      """SELECT event_type, COUNT(*) AS cnt FROM events
         WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-07 00:00:00'
         GROUP BY event_type ORDER BY event_type""",
    "p4_inlist_lookup" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE user_id IN (17, 41, 89) ORDER BY event_id""",
    "p5_string_predicate" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
         WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey LIMIT 200""",
    "a1_count" -> "SELECT COUNT(*) AS row_count FROM lineitem",
    "a2_checksums" ->
      """SELECT COUNT(*) AS row_count,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
         FROM lineitem""",
    "a4_percentile_value" ->
      """SELECT event_type, round(quantile_cont(value, 0.95), 4) AS p95, COUNT(*) AS cnt
         FROM events GROUP BY event_type ORDER BY event_type""",
    "a6_count_distinct" ->
      """SELECT COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT event_type) AS n_types FROM events""",
    "a5_reaggregation" ->
      """SELECT CAST(SUM(cnt) AS BIGINT) AS total_events FROM
         (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type)""",
    "o2_top1_latest" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
         ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""",
    "o3_limit" -> "SELECT * FROM orders ORDER BY o_orderkey LIMIT 10",
    "f5_arithmetic_agg" ->
      """SELECT l_orderkey,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS net_revenue
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 100""",
    "f6_date_cast" ->
      """SELECT event_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ds FROM events
         WHERE event_type = 'purchase' ORDER BY event_id LIMIT 200""",
    "f7_current_timestamp" ->
      "SELECT COUNT(*) AS n_past FROM events WHERE ts < current_timestamp",
    "f10_json_extract" ->
      """SELECT event_type,
           COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_parsed,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "f14_try_cast" ->
      """WITH r AS (
           SELECT event_type, event_id,
                  CASE WHEN event_id % 7 = 0 THEN event_type
                       ELSE regexp_extract(props, '[0-9]+', 0) END AS raw
           FROM events)
         SELECT event_type, COUNT(*) AS n_rows,
                CAST(SUM(CASE WHEN TRY_CAST(raw AS BIGINT) IS NOT NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
                CAST(SUM(COALESCE(TRY_CAST(raw AS BIGINT), 0)) AS BIGINT) AS parsed_sum
         FROM r GROUP BY event_type ORDER BY event_type""",
    "a8_histogram" ->
      """WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
         SELECT CAST(LEAST(GREATEST(FLOOR((value - lo) * 10 / (hi - lo)), 0), 9) AS BIGINT) AS bucket,
                COUNT(*) AS n_rows
         FROM events, b GROUP BY bucket ORDER BY bucket""",
    "w9_moving_window" ->
      """SELECT user_id, event_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS DECIMAL(18,2)) AS DOUBLE) AS moving_sum,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_in_frame
         FROM events WHERE user_id < 10
         ORDER BY user_id, event_id""",
    "dq_referential" ->
      """SELECT * FROM (
           SELECT 'lineitem->orders' AS relationship, CAST(COUNT(*) AS BIGINT) AS orphan_rows
           FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
           UNION ALL
           SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT)
           FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
           UNION ALL
           SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT)
           FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
           UNION ALL
           SELECT 'orders->customer_stale', CAST(COUNT(*) AS BIGINT)
           FROM orders WHERE o_custkey NOT IN (
             SELECT c_custkey FROM customer WHERE c_custkey < 1000))
         ORDER BY relationship""",
    "w8_running_total" ->
      """SELECT user_id, event_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DECIMAL(18,2)) AS DOUBLE) AS running_value
         FROM events WHERE user_id < 10
         ORDER BY user_id, event_id""",
    "f13_regex_extract" ->
      """SELECT event_type, COUNT(*) AS n_matched,
           CAST(SUM(CAST(k_str AS BIGINT)) AS BIGINT) AS sum_k
         FROM (SELECT event_type,
                 regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS k_str
               FROM events)
         WHERE k_str <> ''
         GROUP BY event_type ORDER BY event_type""",
    "f11_fuzzy_match" ->
      """SELECT a.n_nationkey AS id_a, b.n_nationkey AS id_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
         FROM nation a CROSS JOIN nation b
         WHERE a.n_nationkey < b.n_nationkey
           AND levenshtein(a.n_name, b.n_name) <= 4
         ORDER BY id_a, id_b""",
    "f12_unpivot" ->
      """WITH wide AS (
           SELECT l_returnflag,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS qty,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS price
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, 'qty' AS metric, qty AS value FROM wide
         UNION ALL
         SELECT l_returnflag, 'price' AS metric, price AS value FROM wide
         ORDER BY l_returnflag, metric""",
    "f8_typed_null" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS VARCHAR) AS channel
         FROM nation ORDER BY n_nationkey LIMIT 5""",
    "j3_join_agg_revenue" ->
      """SELECT n_name,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue,
           COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "j4_anti_join" ->
      """SELECT COUNT(*) AS n_customers_no_orders FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
    "j6_star_join" ->
      """SELECT p_brand, s_nationkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
         FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY p_brand, s_nationkey ORDER BY p_brand, s_nationkey""",
    "j7_local_supplier" ->
      """SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
         FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "w1_window_rank" ->
      """SELECT c_mktsegment, rnk, o_orderkey, o_totalprice FROM (
           SELECT c_mktsegment, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders JOIN customer ON o_custkey = c_custkey)
         WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""",
    "a7_stats_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n,
           round(stddev_samp(l_quantity), 5) AS sd_qty,
           round(var_samp(l_discount), 5) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 5) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 5) AS cov_qty_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "w6_ntile_deciles" ->
      """SELECT o_orderpriority, decile, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
         FROM (SELECT o_orderpriority, o_totalprice,
                 ntile(10) OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice DESC, o_orderkey) AS decile
               FROM orders)
         GROUP BY o_orderpriority, decile ORDER BY o_orderpriority, decile""",
    "w7_global_deciles" ->
      """WITH b AS (
           SELECT quantile_cont(o_totalprice,
                    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
           FROM orders)
         SELECT CAST(1 + len(list_filter(bs, x -> o_totalprice > x)) AS INT) AS decile,
                COUNT(*) AS n_orders,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
         FROM orders CROSS JOIN b
         GROUP BY decile ORDER BY decile""",
    "w4_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_qty,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",
    "w5_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY gid, o_orderstatus, o_orderpriority""",
    "w2_having" ->
      """SELECT l_partkey, COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_qty
         FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 8 ORDER BY l_partkey""",
    "w3_conditional_agg" ->
      """SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "s2_synth_range" ->
      """SELECT i AS user_id,
           make_timestamp((1735689600 + i % 2592000) * 1000000) AS ts,
           (['Paris','Seoul','Tokyo','Lyon','Lille','Marseille','Nantes','Bordeaux'])[CAST(i % 8 AS INT) + 1] AS city,
           (['A','B','C','D','E'])[CAST(i % 5 AS INT) + 1] AS category
         FROM range(1000) t(i) ORDER BY user_id""",
    "s2_synth_full" ->
      """SELECT i AS user_id,
           make_timestamp((1735689600 + i % 2592000) * 1000000) AS ts,
           round(CAST(xor(i * 2654435761 + 40503, (i * 2654435761 + 40503) >> 16) % 1000000 AS DOUBLE) / 1000.0, 3) AS amount,
           (['Paris','Seoul','Tokyo','Lyon','Lille','Marseille','Nantes','Bordeaux'])[CAST(i % 8 AS INT) + 1] AS city,
           (['A','B','C','D','E'])[CAST(i % 5 AS INT) + 1] AS category
         FROM range(1000) t(i) ORDER BY user_id"""
  )
}
