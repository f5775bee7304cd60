package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-3 surface widening: the window value functions
  * (first/last/nth/lead), LEFT OUTER join, exact median + deterministic
  * mode, FILTER-clause conditional aggregates, ordered string aggregation,
  * the salted-JOIN skew pattern, hopping (sliding) event-time windows, the
  * scalar math surface, and regex redaction (the PII-scrub shape).
  *
  * Scale notes: every query is either a projection (codegen'd, no
  * shuffle), a keyed aggregate with map-side partials, or a per-key
  * window — no global windows, no driver loops. The salted join is the
  * manual skew-split twin of AQE's runtime splitting, proven equal to the
  * direct join by its oracle.
  */
object CoverageQueries extends QueryPack {

  private val SaltBuckets = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Window VALUE functions over one deterministic per-key order:
    // first/last need the full-partition frame (default frames cut last
    // at CURRENT ROW); lead is an offset function and takes its own
    // frameless window.
    "window_first_last" -> ((s, d) => {
      val order = Seq(col("o_orderdate"), col("o_orderkey"))
      val wf = Window.partitionBy(col("o_custkey")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wp = Window.partitionBy(col("o_custkey")).orderBy(order: _*)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(wf).as("first_order"),
          last(col("o_orderkey")).over(wf).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(wf).as("second_order"),
          lead(col("o_orderkey"), 1).over(wp).as("next_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // LEFT OUTER join + aggregate: per-customer order counts including
    // order-less customers (count of the null-extended column is 0).
    "left_join_order_counts" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spend"))
        .orderBy("c_custkey")),

    // Exact median (integer-cents percentile: interpolation midpoints are
    // x.0/x.5, exact in every engine) + deterministic mode (max count,
    // min user tiebreak) — two keyed aggregates and a per-key argmax.
    "median_mode_by_type" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"), col("user_id"),
        round(col("value") * 100, 0).cast("long").as("_cents"))
      val med = ev.groupBy(col("event_type"))
        .agg(percentile(col("_cents"), lit(0.5)).as("median_cents"))
      val mode = ev.groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("mode_n"))
        .withColumn("_rk", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("mode_n").desc, col("user_id"))))
        .where(col("_rk") === 1)
        .select(col("event_type"), col("user_id").as("mode_user"), col("mode_n"))
      med.join(mode, "event_type").orderBy("event_type")
    }),

    // Conditional aggregation: FILTER-clause twins (count/sum over a
    // predicate subset) + bool_or — one pass, no per-predicate scans.
    "conditional_aggs" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))), 2)
            .as("rev_high_disc"),
          count(when(col("l_quantity") <= 10, 1)).as("n_small_qty"),
          bool_or(col("l_quantity") > 45).as("has_jumbo"))
        .orderBy("l_linestatus")),

    // Ordered string aggregation (LISTAGG/string_agg twin): sort the
    // collected set so the concatenation is deterministic under any
    // partitioning.
    "listagg_nations" -> ((s, d) =>
      nation(s, d)
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_name")),

    // Salted JOIN (skew pattern): the orders build side is replicated 8
    // ways, the lineitem probe side salted deterministically — a hot
    // orderkey spreads over 8 reducers. The oracle is the DIRECT join, so
    // hash equality proves the transformation is identity on results.
    "salted_join_priority" -> ((s, d) => {
      val fact = lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
        col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
      val dim = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
      graft.ops.Salt.saltedJoin(fact, dim, "o_orderkey", col("l_linenumber"), SaltBuckets)
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),

    // Hopping (sliding) event-time windows: 10-minute windows every 5
    // minutes — each event lands in exactly 2 windows (Spark expands
    // before the keyed aggregate; the shuffle carries window starts, not
    // events×windows materialized rows).
    "sliding_window_10m" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
        .select(tsMillis(col("w.start")).as("w_start_ms"), col("n"), col("sum_value"))
        .orderBy("w_start_ms")),

    // Scalar math surface (projection-only, whole-stage codegen): exact
    // integer-valued results where possible; sqrt is IEEE
    // correctly-rounded (engine-identical), ln/log10 are rounded to 6dp
    // (transcendental values never sit on rounding midpoints).
    "math_funcs" -> ((s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("abs_qty_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        signum(col("l_quantity") - 25).cast("int").as("qty_sign"),
        pmod(col("l_orderkey"), lit(7L)).as("key_mod7"),
        greatest(col("l_quantity"), col("l_linenumber") * lit(10.0)).as("g_val"),
        least(col("l_quantity"), col("l_linenumber") * lit(10.0)).as("l_val"),
        pow(lit(2.0), col("l_linenumber")).as("pow2_line"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(log10(col("l_extendedprice")), 6).as("log10_price"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Regex redaction (the PII-scrub shape over semi-structured payloads):
    // replace every digit run, count the redactions — projection-only,
    // the same plan a 100 TB scrub pass would run.
    "redact_numeric_ids" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "<NUM>").as("redacted"),
          regexp_count(col("props"), lit("[0-9]+")).as("n_redacted"))
        .orderBy("event_id")))

  def oracleSql: Map[String, String] = Map(
    "window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER wf AS first_order,
        |  last_value(o_orderkey) OVER wf AS last_order,
        |  nth_value(o_orderkey, 2) OVER wf AS second_order,
        |  lead(o_orderkey, 1) OVER wp AS next_order
        |FROM orders
        |WINDOW
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |  wp AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "left_join_order_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "median_mode_by_type" ->
      """WITH ev AS (SELECT event_type, user_id,
        |              CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |med AS (SELECT event_type, quantile_cont(cents, 0.5) AS median_cents
        |        FROM ev GROUP BY event_type),
        |uc AS (SELECT event_type, user_id, count(*) AS mode_n
        |       FROM ev GROUP BY event_type, user_id),
        |m AS (SELECT event_type, user_id AS mode_user, mode_n FROM uc
        |      QUALIFY row_number() OVER (PARTITION BY event_type
        |                                 ORDER BY mode_n DESC, user_id) = 1)
        |SELECT event_type, median_cents, mode_user, mode_n
        |FROM med JOIN m USING (event_type) ORDER BY event_type""".stripMargin,

    "conditional_aggs" ->
      """SELECT l_linestatus,
        |  count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
        |  round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
        |    AS rev_high_disc,
        |  count(*) FILTER (WHERE l_quantity <= 10) AS n_small_qty,
        |  bool_or(l_quantity > 45) AS has_jumbo
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "listagg_nations" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    // Deliberately the DIRECT (unsalted) join: hash equality proves the
    // salted plan computes the identical result.
    "salted_join_priority" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Each event belongs to exactly ceil(10/5)=2 hopping windows: starts
    // time_bucket_5m(ts) and time_bucket_5m(ts) - 5 min (both epoch-
    // aligned, matching Spark's window alignment).
    "sliding_window_10m" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts)
        |         - k * INTERVAL '5 minutes') AS w_start_ms,
        |  count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events, (SELECT unnest([0, 1]) AS k)
        |GROUP BY 1 ORDER BY w_start_ms""".stripMargin,

    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS abs_qty_dev,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(sign(l_quantity - 25) AS INT) AS qty_sign,
        |  l_orderkey % 7 AS key_mod7,
        |  greatest(l_quantity, l_linenumber * 10.0) AS g_val,
        |  least(l_quantity, l_linenumber * 10.0) AS l_val,
        |  pow(2.0, l_linenumber) AS pow2_line,
        |  round(sqrt(l_quantity), 6) AS sqrt_qty,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  round(log10(l_extendedprice), 6) AS log10_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "redact_numeric_ids" ->
      """SELECT event_id,
        |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted,
        |  len(regexp_extract_all(props, '[0-9]+')) AS n_redacted
        |FROM events ORDER BY event_id""".stripMargin)
}
