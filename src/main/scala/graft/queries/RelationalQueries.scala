package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Extended relational surface over the star-schema fixtures: joins (with
  * broadcast of dimension tables), semi/anti joins, window ranking, running
  * aggregates, rollup/cube, set ops, event-time bucketing.
  *
  * Scale notes baked into each plan: only CONSTANT-cardinality dimensions
  * (nation, region — 25/5 rows at any SF) carry explicit `broadcast()`
  * hints; tables that scale with the data (customer, supplier, orders)
  * leave join strategy to AQE, which broadcasts under the size threshold
  * at small SF and falls back to shuffle joins with skew splitting at
  * 100 TB. Filters sit directly on the scans so Catalyst pushes them into
  * parquet.
  */
object RelationalQueries extends QueryPack {

  private val CutTs = "1998-07-01 00:00:00"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary — partial aggregation + tiny shuffle
    // (a handful of groups); the canonical scale-safe aggregate.
    "q1_agg" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2)
            .as("sum_charge"),
          graft.ops.Metrics.meanExact2dp(col("l_quantity")).as("avg_qty"),
          graft.ops.Metrics.meanExact2dp(col("l_extendedprice")).as("avg_price"),
          graft.ops.Metrics.meanExact2dp(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q6 shape: pure filter + global aggregate — the pushdown
    // showcase (all three predicates reach the parquet scan).
    "q6_forecast_revenue" -> ((s, d) =>
      lineitem(s, d)
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
               col("l_shipdate") <  to_timestamp(lit("1997-01-01 00:00:00")) &&
               col("l_discount").between(0.02, 0.04) &&
               col("l_quantity") < 10)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q3 shape: no forced broadcast — customer scales with the data,
    // so join strategy is left to AQE (auto-broadcasts under the threshold
    // at small SF, sort-merge with skew handling at 100 TB); top-10 by a
    // deterministic (rounded revenue, key) order.
    "q3_shipping_priority" -> ((s, d) => {
      val c = customer(s, d).where(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).where(col("o_orderdate") < to_timestamp(lit(CutTs)))
      val l = lineitem(s, d).where(col("l_shipdate") > to_timestamp(lit(CutTs)))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          tsMillis(col("o_orderdate")).as("o_orderdate_ms"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: five joins. Only the CONSTANT-cardinality dims
    // (nation: 25 rows, region: 5 rows at any SF) get broadcast hints;
    // customer/supplier scale with the data, so their strategy is AQE's
    // call (broadcast at small SF, shuffle at 100 TB).
    "q5_nation_revenue" -> ((s, d) => {
      val r = region(s, d).where(col("r_name") === "ASIA")
      val o = orders(s, d)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
               col("o_orderdate") <  to_timestamp(lit("1997-01-01 00:00:00")))
      lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Left-semi join (EXISTS): customers having at least one urgent order.
    "semi_join_urgent" -> ((s, d) => {
      val urgent = orders(s, d).where(col("o_orderpriority") === "1-URGENT")
      customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // Correlated scalar subquery (SQL surface): each customer's best
    // order(s) via a per-customer max subquery. Catalyst DECORRELATES
    // this into one aggregate + one key-equi join — no per-row subquery
    // execution — so the SQL spelling costs the same as the hand-written
    // argmax plan (plan-audited). The predicate is an exact equality on a
    // stored double (max picks an element, no accumulation), so there is
    // no float-boundary hazard in the oracle compare.
    "correlated_max_order" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders_v o
        WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders_v o2
                              WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_custkey, o_orderkey""")
    }),

    // Per-key top-k through the CUSTOM physical operator (plans/TopKPerKey
    // via GraftStrategies): one key shuffle + bounded per-key heaps —
    // O(n log k) and O(#keys·k) memory instead of the window spelling's
    // full per-partition sort. Total order via the o_orderkey tiebreak.
    "topk_orders_per_cust" -> ((s, d) =>
      graft.plans.TopK.perKey(orders(s, d), Seq("o_custkey"),
          Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "o_orderkey")),

    // Left-anti join (NOT EXISTS): the slow-mover report — parts with
    // no shipment since 2001 (the fixture's final shipdate year). The
    // unrestricted form was evidence-vacuous (every part has SOME
    // lineitem at every SF, so both engines returned the empty set and
    // the gate hash-matched trivially — r12 verdict #3); the date
    // window gives the anti-join survivors at every SF while keeping
    // the same plan shape, with the shipdate filter pushed into the
    // lineitem scan before the join.
    "anti_join_unsold_parts" -> ((s, d) =>
      part(s, d)
        .join(lineitem(s, d).where(col("l_shipdate") >= lit("2001-01-01").cast("date")),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("p_brand")),

    // DISTINCT + UNION (set semantics — union dedups).
    "distinct_union" -> ((s, d) =>
      lineitem(s, d).select(col("l_returnflag").as("flag")).distinct()
        .union(lineitem(s, d).select(col("l_linestatus").as("flag")).distinct())
        .distinct()
        .orderBy("flag")),

    // Partitioned ranking window: top-2 parts per brand by price.
    "window_rank_parts" -> ((s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      part(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
        .select(col("p_brand"), col("p_partkey"),
          round(col("p_retailprice"), 2).as("p_retailprice"), col("rn"))
        .orderBy("p_brand", "rn")
    }),

    // Running-sum frame window: cumulative spend per customer over time.
    "window_running_total" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // RANGE-frame window: value-based frame bounds (all events within the
    // trailing 5 minutes of THIS row's time), vs the ROWS frames above —
    // the sliding-aggregate shape for per-key telemetry. Per-user
    // partitions keep frames bounded and parallel.
    "window_range_moving_avg" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("event_id"), tsMillis(col("ts")).as("ts_ms"),
          col("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
        .rangeBetween(-300000L, Window.currentRow)
      // integer-cents frame sum → one exact division: sliding-frame
      // add/remove order can't perturb a long sum (midpoint-lottery-free,
      // same as Metrics.meanExact2dp)
      ev.withColumn("moving_avg",
          sum(round(col("value") * 100, 0).cast("long")).over(w).cast("double") /
            (count(lit(1)).over(w) * lit(100.0)))
        .withColumn("n_in_window", count(lit(1)).over(w))
        .select(col("event_id"), col("moving_avg"), col("n_in_window"))
        .orderBy("event_id")
    }),

    // GROUPING SETS: arbitrary grouping combinations in one pass (the
    // general form behind cube/rollup), with grouping_id disambiguating
    // which set produced each row — Spark expands to a single shuffle.
    "grouping_sets_orders" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderpriority, o_orderstatus,
              |  grouping_id(o_orderpriority, o_orderstatus) AS gid,
              |  count(*) AS n
              |FROM orders_gs
              |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
              |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
              |""".stripMargin)
    }),

    // ROLLUP: hierarchical subtotals (grand total included).
    "rollup_pricing" -> ((s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // CUBE: all grouping-set combinations.
    "cube_orders" -> ((s, d) =>
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),

    // PIVOT: per-user-bucket value sums spread across event types
    // (explicit value list keeps the schema deterministic — no extra pass).
    "pivot_event_type" -> ((s, d) =>
      events(s, d)
        .groupBy((col("user_id") % 100).as("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum(col("value")), 6))
        .orderBy("user_bucket")),

    // Exact distinct-count per group (two-phase distinct aggregation).
    "count_distinct_users" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // Scalar string-function surface (projection-only, codegen'd).
    "string_funcs" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 5).as("name_prefix"),
        lpad(col("c_nationkey").cast("string"), 4, "0").as("nation_padded"),
        concat_ws("-", col("c_mktsegment"), col("c_nationkey").cast("string")).as("seg_key"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("B")).as("seg_or_b"))
        .orderBy("c_custkey")),

    // Scalar date/time-function surface.
    "date_funcs" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        quarter(col("o_orderdate")).as("q"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"),
        tsMillis(date_trunc("month", col("o_orderdate"))).as("month_start_ms"))
        .orderBy("o_orderkey")),

    // As-of (backward) join — per event, the most recent preceding 'error'
    // event of the same user ("time since last error" feature). Spark has
    // no native as-of join; graft.ops.AsOfJoin provides the union-and-fill
    // plan (one key shuffle + in-partition sort).
    "asof_last_error" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        tsMillis(col("ts")).as("ts_ms"))
      val errors = events(s, d).where(col("event_type") === "error")
        .select(col("user_id"), tsMillis(col("ts")).as("err_ts_ms"))
      graft.ops.AsOfJoin.backward(ev, errors, Seq("user_id"), "ts_ms", "err_ts_ms")
        .select(col("event_id"), (col("ts_ms") - col("err_ts_ms")).as("ms_since_error"))
        .orderBy("event_id")
    }),

    // FULL OUTER join: per-nation customer vs supplier counts — either
    // side may be missing; keys coalesced. (Two pre-aggregated inputs, so
    // the outer join runs on nation-sized frames, not fact tables.)
    "full_outer_nation_counts" -> ((s, d) => {
      val c = customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      val sup = supplier(s, d).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(sup, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
        .orderBy("nationkey")
    }),

    // The full ranking family over one deterministic total order:
    // ntile (depends on row order — the custkey tiebreak makes it
    // engine-stable), dense_rank, percent_rank, cume_dist.
    "window_rank_family" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          dense_rank().over(w).as("drank"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // Statistical aggregates (Welford-style variance, correlation).
    "stats_aggs" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"))
        .orderBy("l_returnflag")),

    // Deterministic argmax row per group (row_number form — portable).
    "argmax_customer" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      customer(s, d)
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col("c_mktsegment"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
        .orderBy("c_mktsegment")
    }),

    // Generator/flatten: explode the token array (LATERAL/unnest twin),
    // then a grouped count over the generated rows.
    "explode_tokens" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), explode(graft.ext.TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("token")),

    // JSON extraction from the props column (schema-on-read).
    "json_extract_props" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")),

    // Spark 4 VARIANT ingestion: parse the JSON column ONCE into the
    // binary variant encoding, then typed-path reads via variant_get —
    // the semi-structured scale path (an open shredded format the scan
    // can eventually push into), vs get_json_object's per-access string
    // re-parse above. Value mass in exact integer cents (the
    // percentile_surface rule) so the grouped sums hash identically;
    // the oracle is the portable JSON spelling of the same result.
    // try_parse_json, not parse_json: Spark's strict parse THROWS on a
    // malformed props value where DuckDB's json_extract_string returns
    // NULL — on real data the strict form diverges from the oracle
    // before it diverges from correctness (r12 advice). Null group keys
    // are ordered NULLS LAST explicitly on both sides for the same
    // reason (Spark defaults nulls-first ASC, DuckDB nulls-last).
    "variant_props_agg" -> ((s, d) =>
      events(s, d)
        .select(expr("try_parse_json(props)").as("v"),
          expr("cast(round(value * 100) as bigint)").as("_cents"))
        .select(expr("try_variant_get(v, '$.k', 'int')").as("k"), col("_cents"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("_cents")).as("value_cents"))
        .orderBy(col("k").asc_nulls_last)),

    // VARIANT nested-path reads (r12 verdict #5: the surface read one
    // flat typed path). The variant value here is CONSTRUCTED from
    // fixture columns (to_json of a nested struct + array, parsed once
    // into the binary encoding) because the fixture's props column is
    // flat JSON — what's exercised is the variant path machinery:
    // object member → object member, array index, and a typed leaf
    // under grouping. The oracle replays the same values straight from
    // the source columns, which is exactly what makes it an oracle: the
    // variant round-trip must be value-preserving.
    "variant_nested_paths" -> ((s, d) =>
      events(s, d)
        .select(
          parse_json(to_json(struct(
            struct(col("event_type").as("type"),
              array(col("event_id") % 2, col("event_id") % 3).as("flags")).as("meta"),
            expr("cast(round(value * 100) as bigint)").as("cents")))).as("v"))
        .select(
          expr("variant_get(v, '$.meta.type', 'string')").as("etype"),
          expr("variant_get(v, '$.meta.flags[1]', 'bigint')").as("flag1"),
          expr("variant_get(v, '$.cents', 'bigint')").as("cents"))
        .groupBy(col("etype"), col("flag1"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy("etype", "flag1")),

    // try_* null semantics end-to-end: malformed documents (planted on
    // every 10th event) parse to NULL variants instead of throwing, a
    // missing path under try_variant_get is NULL instead of an error,
    // and both survive a projection + sort — the ingestion contract a
    // 100 TB semi-structured feed needs (bad records quarantine as
    // nulls; they must never kill the job).
    "variant_try_get_nulls" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          when(col("event_id") % 10 === 0, lit("{oops"))
            .otherwise(col("props")).as("_js"))
        .select(col("event_id"), expr("try_parse_json(_js)").as("v"))
        .select(col("event_id"),
          expr("try_variant_get(v, '$.k', 'int')").as("k"),
          expr("try_variant_get(v, '$.missing', 'int')").as("missing_k"),
          col("v").isNull.as("malformed"))
        .orderBy("event_id")),

    // Set operations: INTERSECT and EXCEPT (distinct semantics).
    "set_ops" -> ((s, d) => {
      val urgent = orders(s, d).where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val open = orders(s, d).where(col("o_orderstatus") === "O")
        .select(col("o_custkey"))
      urgent.intersect(open)
        .except(customer(s, d).where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("o_custkey")))
        .orderBy("o_custkey")
    }),

    // Sessionization (batch twin of the stateful streaming operator):
    // 30-minute inactivity gap, lag + cumulative-sum session ids.
    "sessionize_30m" -> ((s, d) =>
      graft.stream.Sessionize.batch(
          events(s, d).select(col("user_id"), tsMillis(col("ts")).as("ts_ms"),
            col("event_id")),
          gapMs = 1800000L)
        .orderBy("user_id", "session_start_ms")),

    // Two-phase salted aggregation (skew pattern) — result identical to
    // the direct groupBy, verified by the plain-SQL oracle.
    "salted_agg_by_type" -> ((s, d) =>
      graft.ops.Salt.saltedAgg(events(s, d), Seq("event_type"), col("event_id"),
          buckets = 16, sums = Seq("value"))
        .select(col("event_type"), round(col("sum_value"), 6).as("sum_value"), col("n"))
        .orderBy("event_type")),

    // Event-time bucketing via the native `window()` — the batch twin of a
    // streaming tumbling-window aggregation.
    "time_window_5m" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
        .select(tsMillis(col("w.start")).as("w_start_ms"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("w_start_ms", "event_type")))

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  ${graft.ops.Metrics.meanExact2dpSql("l_quantity")} AS avg_qty,
        |  ${graft.ops.Metrics.meanExact2dpSql("l_extendedprice")} AS avg_price,
        |  ${graft.ops.Metrics.meanExact2dpSql("l_discount")} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT l_orderkey,
         |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         |  epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '$CutTs'
         |  AND l_shipdate > TIMESTAMP '$CutTs'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "semi_join_urgent" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "correlated_max_order" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "topk_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 2 ORDER BY o_custkey, o_orderkey""".stripMargin,

    "anti_join_unsold_parts" ->
      """SELECT p_brand, count(*) AS n_parts
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_shipdate >= DATE '2001-01-01')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "distinct_union" ->
      """SELECT l_returnflag AS flag FROM lineitem
        |UNION
        |SELECT l_linestatus AS flag FROM lineitem
        |ORDER BY flag""".stripMargin,

    "window_rank_parts" ->
      """SELECT p_brand, p_partkey, round(p_retailprice, 2) AS p_retailprice, rn
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        row_number() OVER (PARTITION BY p_brand
        |                           ORDER BY p_retailprice DESC, p_partkey) AS rn
        |      FROM part)
        |WHERE rn <= 2 ORDER BY p_brand, rn""".stripMargin,

    "window_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate, o_orderkey
        |                                ROWS UNBOUNDED PRECEDING), 2) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_range_moving_avg" ->
      """SELECT event_id,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
        |    / (count(*) OVER w * 100.0) AS moving_avg,
        |  count(*) OVER w AS n_in_window
        |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
        |             RANGE BETWEEN 300000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "grouping_sets_orders" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  grouping_id(o_orderpriority, o_orderstatus) AS gid,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.04
        |  AND l_quantity < 10""".stripMargin,

    "pivot_event_type" ->
      """SELECT user_id % 100 AS user_bucket,
        |  round(sum(value) FILTER (event_type = 'click'), 6) AS click,
        |  round(sum(value) FILTER (event_type = 'error'), 6) AS error,
        |  round(sum(value) FILTER (event_type = 'purchase'), 6) AS purchase,
        |  round(sum(value) FILTER (event_type = 'signup'), 6) AS signup,
        |  round(sum(value) FILTER (event_type = 'view'), 6) AS view
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,

    "count_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS name_upper, length(c_name) AS name_len,
        |  substring(c_name, 1, 5) AS name_prefix,
        |  lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
        |  concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_key,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'B') AS seg_or_b
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  quarter(o_orderdate) AS q, dayofweek(o_orderdate) AS dow,
        |  epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "asof_last_error" ->
      """SELECT e.event_id, epoch_ms(e.ts) - epoch_ms(err.ts) AS ms_since_error
        |FROM events e
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') err
        |  ON e.user_id = err.user_id AND e.ts >= err.ts
        |ORDER BY e.event_id""".stripMargin,

    "full_outer_nation_counts" ->
      """WITH c AS (SELECT c_nationkey, count(*) AS n_customers
        |           FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey, count(*) AS n_suppliers
        |      FROM supplier GROUP BY 1)
        |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        |  coalesce(n_customers, 0) AS n_customers,
        |  coalesce(n_suppliers, 0) AS n_suppliers
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,

    "window_rank_family" ->
      """SELECT c_mktsegment, c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  dense_rank() OVER w AS drank,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "stats_aggs" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "argmax_customer" ->
      """SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS c_acctbal
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_acctbal DESC, c_custkey) AS rn
        |      FROM customer)
        |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,

    "explode_tokens" ->
      """SELECT t.token, count(*) AS n, count(DISTINCT d.doc_id) AS n_docs
        |FROM documents d, unnest(string_split_regex(lower(d.text), '\s+')) AS t(token)
        |GROUP BY t.token ORDER BY t.token""".stripMargin,

    "json_extract_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "variant_props_agg" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY k NULLS LAST""".stripMargin,

    "variant_nested_paths" ->
      """SELECT event_type AS etype, event_id % 3 AS flag1,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY etype, flag1""".stripMargin,

    "variant_try_get_nulls" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 10 = 0 THEN NULL
        |       ELSE CAST(json_extract_string(props, '$.k') AS INT) END AS k,
        |  CAST(NULL AS INT) AS missing_k,
        |  event_id % 10 = 0 AS malformed
        |FROM events ORDER BY event_id""".stripMargin,

    "set_ops" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY o_custkey""".stripMargin,

    "sessionize_30m" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events),
        |marked AS (
        |  SELECT user_id, ts_ms, event_id,
        |    CASE WHEN lag(ts_ms) OVER w IS NULL
        |           OR ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |sess AS (
        |  SELECT user_id, ts_ms,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM marked)
        |SELECT user_id, min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_start_ms""".stripMargin,

    "salted_agg_by_type" ->
      """SELECT event_type, round(sum(value), 6) AS sum_value, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "time_window_5m" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts)) AS w_start_ms,
        |  event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start_ms, event_type""".stripMargin)
}
