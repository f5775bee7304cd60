package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-3 function-surface widening: the array / map / higher-order
  * function families, multiset set operations (INTERSECT ALL / EXCEPT
  * ALL), schema-evolution union (unionByName with missing columns), SQL
  * subquery forms (EXISTS / NOT IN / uncorrelated scalar), struct
  * manipulation (withField / dropFields), and positional explode.
  *
  * Scale notes: every query here is per-row projection work or a keyed
  * aggregate with map-side partials. Arrays stay per-row (document tokens,
  * per-order quantity lists — bounded fan-in), higher-order lambdas only
  * ever see already-staged attribute arrays (inlining the split would
  * re-tokenize per element — see Dedup's staging note), and the set ops
  * hash-partition on the compared column exactly like a groupBy. The
  * EXISTS / IN subqueries decorrelate to semi / anti hash joins
  * (plan-audited in PlanAuditSpec), not per-row subplans.
  */
object FunctionSurfaceQueries extends QueryPack {

  /** Tokens of a document, lowercased, staged as one attribute. */
  private def toks: Column = split(lower(col("text")), "\\s+")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ANSI-robustness try_* surface: null-on-error arithmetic/cast/access
    // — what a 100 TB pipeline uses instead of job-killing exceptions on
    // dirty rows. try_divide (zero denom), try_cast (non-numeric), JSON
    // field cast, try_add (int64 overflow), try_element_at (out of range).
    "try_funcs" -> ((s, d) =>
      events(s, d).select(col("event_id"),
        expr("try_divide(value, event_id % 3)").as("tdiv"),
        expr("try_cast(event_type as int)").as("tcast_int"),
        expr("try_cast(get_json_object(props, '$.k') as bigint)").as("tk"),
        expr("try_add(9223372036854775807, event_id % 2)").as("tadd"),
        expr("try_element_at(split(event_type, '_'), 2)").as("telem"))
        .orderBy("event_id")),

    // Window IGNORE NULLS surface: last/lead over a sparsified column
    // (value nulled on every 5th event) — LOCF (last observation carried
    // forward) per user, the canonical sparse-sensor fill. One keyed
    // window, partitioned by user.
    "window_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      events(s, d)
        .select(col("user_id"), col("event_id"),
          when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value"))
            .as("v"))
        .select(col("user_id"), col("event_id"), col("v"),
          last(col("v"), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("locf"),
          lead(col("v"), 1, null, ignoreNulls = true).over(w).as("next_v"))
        .orderBy("user_id", "event_id")
    }),

    // explode_outer: generator that PRESERVES rows whose array is empty
    // (null-extended) — the outer-join flavor of explode; dropping such
    // rows silently is a classic pipeline bug.
    "explode_outer_tokens" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, array().cast("array<string>"))
            .otherwise(slice(toks, 1, 3)).as("_head"))
        .select(col("doc_id"), explode_outer(col("_head")).as("tok"))
        .orderBy("doc_id", "tok")),

    // Bitwise aggregate surface: AND/OR/XOR folds over integer columns —
    // flag-mask consolidation (permission bits, feature masks) as one
    // partial-aggregated pass.
    "bitwise_aggs" -> ((s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(bit_and(col("event_id") % 256).as("b_and"),
          bit_or(col("event_id") % 256).as("b_or"),
          bit_xor(col("event_id") % 256).as("b_xor"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // Array mutation surface (Spark 3.4+): append / prepend-via-insert /
    // compact (null removal) / positional update over token heads.
    "array_mutation_funcs" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), slice(toks, 1, 3).as("_h"))
        .select(col("doc_id"),
          array_join(array_append(col("_h"), lit("EOS")), " ").as("appended"),
          array_join(array_insert(col("_h"), lit(1), lit("BOS")), " ").as("prepended"),
          size(array_compact(concat(col("_h"), array(lit(null).cast("string")))))
            .as("n_compacted"),
          array_join(array_remove(col("_h"), element_at(col("_h"), 1)), " ")
            .as("removed_first"))
        .orderBy("doc_id")),

    // Array function surface over per-document token arrays: size, slice
    // + join, membership, max, distinct cardinality, negative indexing.
    "array_funcs" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_toks"),
          array_join(slice(col("toks"), 1, 3), " ").as("head3"),
          array_contains(col("toks"), "the").as("has_the"),
          array_max(col("toks")).as("max_tok"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          element_at(col("toks"), -1).as("last_tok"))
        .orderBy("doc_id")),

    // Map surface: build a per-user event_type -> count map from grouped
    // rows (map_from_entries over a sorted entry list so key order is
    // deterministic), then read it back via element_at / map_keys /
    // map_values. The oracle recomputes every extract relationally.
    "map_funcs" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"), col("event_type")).count()
        .groupBy(col("user_id"))
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("event_type"), col("count")))))
          .as("m"))
        .select(col("user_id"),
          size(col("m")).as("n_types"),
          coalesce(element_at(col("m"), lit("click")), lit(0L)).as("clicks"),
          coalesce(element_at(col("m"), lit("purchase")), lit(0L))
            .as("purchases"),
          array_join(map_keys(col("m")), ",").as("types"),
          aggregate(map_values(col("m")), lit(0L), (a, x) => a + x)
            .as("total"))
        .orderBy("user_id")),

    // Higher-order-function surface over per-order quantity arrays:
    // aggregate (fold), filter, exists, forall, zip_with against a
    // position sequence. qtys is sorted so the positional weighted sum is
    // deterministic; the oracle computes the same five facts from rows
    // via window rank + grouped aggregates (no list ops needed).
    "hof_surface" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_quantity").cast("long")))
          .as("qtys"))
        .select(col("l_orderkey"),
          aggregate(col("qtys"), lit(0L), (a, x) => a + x).as("total_qty"),
          size(filter(col("qtys"), _ > 25)).as("n_big"),
          exists(col("qtys"), _ === 50).as("has_50"),
          forall(col("qtys"), _ > 0).as("all_pos"),
          aggregate(
            zip_with(col("qtys"),
              sequence(lit(1L), size(col("qtys")).cast("long")),
              (q, i) => q * i),
            lit(0L), (a, x) => a + x).as("wsum"))
        .orderBy("l_orderkey")),

    // Multiset set operations: INTERSECT ALL keeps min(count_a, count_b)
    // occurrences per value, EXCEPT ALL subtracts occurrence counts —
    // both hash-partition on the value like a groupBy (distinct-free).
    // Aggregated afterwards so the result is the per-key surviving
    // multiplicity.
    "set_ops_all" -> ((s, d) => {
      val li = lineitem(s, d)
      val a = li.where(col("l_quantity") < 25).select(col("l_partkey"))
      val b = li.where(col("l_discount") > 0.02).select(col("l_partkey"))
      val c = li.where(col("l_returnflag") === "R").select(col("l_partkey"))
      a.intersectAll(b).exceptAll(c)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
        .orderBy("l_partkey")
    }),

    // Schema-evolution union: unionByName(allowMissingColumns) aligns by
    // column NAME (not position) and null-extends the missing column —
    // the read path for heterogeneous file batches.
    "union_by_name" -> ((s, d) => {
      val sup = supplier(s, d).select(col("s_suppkey").as("key"),
        col("s_name").as("name"), lit("supplier").as("src"))
      val cust = customer(s, d).select(lit("customer").as("src"),
        col("c_custkey").as("key"))
      sup.unionByName(cust, allowMissingColumns = true)
        .orderBy("src", "key")
    }),

    // SQL subquery forms: correlated EXISTS (decorrelates to a left-semi
    // hash join) and NOT IN over a null-free key (left-anti). Exercises
    // the SQL parser path on registered views.
    "exists_in_subqueries" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("fsq_customer")
      orders(s, d).createOrReplaceTempView("fsq_orders")
      s.sql("""SELECT c_custkey, c_name FROM fsq_customer c
               WHERE EXISTS (SELECT 1 FROM fsq_orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_orderpriority = '1-URGENT')
                 AND c_custkey NOT IN (SELECT o_custkey FROM fsq_orders
                                       WHERE o_orderstatus = 'F')
               ORDER BY c_custkey""")
    }),

    // Uncorrelated scalar subquery: one-row aggregate broadcast into the
    // filter (a subquery-reuse exchange, not a per-row plan). max()*0.5
    // is exact double arithmetic — deterministic across engines.
    "scalar_subquery_threshold" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("fsq_orders2")
      s.sql("""SELECT o_orderkey, o_totalprice FROM fsq_orders2
               WHERE o_totalprice >
                     (SELECT max(o_totalprice) FROM fsq_orders2) * 0.5
               ORDER BY o_orderkey""")
    }),

    // Struct manipulation: build, withField (add), dropFields — the
    // nested-schema evolution surface. Output flattened to scalars so the
    // oracle compares values, not struct encodings.
    "struct_ops" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          struct(col("lang").as("l"), col("n_chars").as("n")).as("st"))
        .select(col("doc_id"),
          col("st").withField("n2", col("st.n") * 2)
            .withField("big", col("st.n") > 500)
            .dropFields("n").as("st2"))
        .select(col("doc_id"), col("st2.l").as("lang"),
          col("st2.n2").as("n2"), col("st2.big").as("big"))
        .orderBy("doc_id")),

    // Positional explode of the first-5-token slice: (pos, tok) pairs per
    // document — the generator/UDTF shape (LATERAL VIEW posexplode).
    "posexplode_tokens" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), slice(toks, 1, 5).as("toks"))
        .select(col("doc_id"), posexplode(col("toks")))
        .withColumnRenamed("col", "tok")
        .orderBy("doc_id", "pos")),

    // VARIANT (Spark 4 semi-structured type): parse the JSON props column
    // into the binary variant encoding once, then shred typed fields out
    // of it — the open-schema path that replaces per-access JSON string
    // re-parsing (get_json_object re-tokenizes the string per call;
    // variant parses once and field access is a binary lookup).
    "variant_extract_props" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "int").as("k"),
          variant_get(col("v"), "$.missing", "variant").isNull.as("no_field"))
        .orderBy("event_id")),

    // unpivot (wide -> long, the inverse of pivot): per-priority metric
    // columns melted into (metric, val) rows. Value columns share one
    // type (double — counts are exact integers in double far below 2^53).
    "unpivot_order_stats" -> ((s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("double").as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"),
          countDistinct(col("o_custkey")).cast("double").as("n_custs"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("n_orders"), col("total"), col("n_custs")),
          "metric", "val")
        .orderBy("o_orderpriority", "metric")),

    // LATERAL correlated subquery with ORDER BY + LIMIT: top-1 order per
    // customer as a lateral derived table — Catalyst rewrites the
    // correlation to a join (no per-row subplan), semantically the
    // argmax/top-k-per-key shape in its SQL spelling.
    "lateral_top_order" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("fsq_customer2")
      orders(s, d).createOrReplaceTempView("fsq_orders3")
      s.sql("""SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
               FROM fsq_customer2 c, LATERAL (
                 SELECT o_orderkey, o_totalprice FROM fsq_orders3 o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) l
               ORDER BY c_custkey""")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "bitwise_aggs" ->
      """SELECT event_type,
        |  bit_and(event_id % 256) AS b_and,
        |  bit_or(event_id % 256) AS b_or,
        |  bit_xor(event_id % 256) AS b_xor,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "array_mutation_funcs" ->
      """WITH t AS (SELECT doc_id,
        |  (string_split_regex(lower(text), '\s+'))[1:3] AS h FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_append(h, 'EOS'), ' ') AS appended,
        |  array_to_string(list_prepend('BOS', h), ' ') AS prepended,
        |  CAST(len(list_filter(h || [NULL]::VARCHAR[], x -> x IS NOT NULL)) AS INT)
        |    AS n_compacted,
        |  coalesce(array_to_string(list_filter(h, x -> x <> h[1]), ' '), '')
        |    AS removed_first
        |FROM t ORDER BY doc_id""".stripMargin,

    "window_ignore_nulls" ->
      """WITH e AS (SELECT user_id, event_id,
        |  CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v FROM events)
        |SELECT user_id, event_id, v,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
        |  lead(v, 1 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id) AS next_v
        |FROM e ORDER BY user_id, event_id""".stripMargin,

    "explode_outer_tokens" ->
      """WITH t AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN []::VARCHAR[]
        |       ELSE (string_split_regex(lower(text), '\s+'))[1:3] END AS head
        |  FROM documents)
        |SELECT doc_id,
        |  unnest(CASE WHEN len(head) = 0 THEN [NULL]::VARCHAR[] ELSE head END) AS tok
        |FROM t ORDER BY doc_id, tok""".stripMargin,

    "try_funcs" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 3 = 0 THEN NULL
        |       ELSE value / (event_id % 3) END AS tdiv,
        |  TRY_CAST(event_type AS INTEGER) AS tcast_int,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS tk,
        |  CASE WHEN event_id % 2 = 1 THEN NULL
        |       ELSE 9223372036854775807 END AS tadd,
        |  string_split(event_type, '_')[2] AS telem
        |FROM events ORDER BY event_id""".stripMargin,

    "array_funcs" ->
      """WITH t AS (SELECT doc_id,
        |  string_split_regex(lower(text), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_toks,
        |  array_to_string(toks[1:3], ' ') AS head3,
        |  list_contains(toks, 'the') AS has_the,
        |  list_max(toks) AS max_tok,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |  toks[-1] AS last_tok
        |FROM t ORDER BY doc_id""".stripMargin,

    "map_funcs" ->
      """SELECT user_id,
        |  CAST(count(DISTINCT event_type) AS INT) AS n_types,
        |  count(*) FILTER (WHERE event_type = 'click') AS clicks,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
        |  count(*) AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "hof_surface" ->
      """WITH r AS (
        |  SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS q,
        |    row_number() OVER (PARTITION BY l_orderkey
        |                       ORDER BY CAST(l_quantity AS BIGINT)) AS i
        |  FROM lineitem)
        |SELECT l_orderkey,
        |  CAST(sum(q) AS BIGINT) AS total_qty,
        |  CAST(count(*) FILTER (WHERE q > 25) AS INT) AS n_big,
        |  bool_or(q = 50) AS has_50,
        |  bool_and(q > 0) AS all_pos,
        |  CAST(sum(q * i) AS BIGINT) AS wsum
        |FROM r GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "set_ops_all" ->
      """SELECT l_partkey, count(*) AS n FROM (
        |  (SELECT l_partkey FROM lineitem WHERE l_quantity < 25
        |   INTERSECT ALL
        |   SELECT l_partkey FROM lineitem WHERE l_discount > 0.02)
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,

    "union_by_name" ->
      """SELECT * FROM (
        |  SELECT s_suppkey AS key, s_name AS name, 'supplier' AS src
        |  FROM supplier
        |  UNION ALL BY NAME
        |  SELECT 'customer' AS src, c_custkey AS key FROM customer)
        |ORDER BY src, key""".stripMargin,

    "exists_in_subqueries" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "scalar_subquery_threshold" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
        |ORDER BY o_orderkey""".stripMargin,

    "struct_ops" ->
      """SELECT doc_id, lang, n_chars * 2 AS n2, n_chars > 500 AS big
        |FROM documents ORDER BY doc_id""".stripMargin,

    "posexplode_tokens" ->
      """WITH t AS (SELECT doc_id,
        |  (string_split_regex(lower(text), '\s+'))[1:5] AS toks
        |  FROM documents)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS tok
        |FROM t, unnest(generate_series(1, len(toks))) AS u(i)
        |ORDER BY doc_id, pos""".stripMargin,

    "variant_extract_props" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  json_extract(props, '$.missing') IS NULL AS no_field
        |FROM events ORDER BY event_id""".stripMargin,

    "unpivot_order_stats" ->
      """WITH w AS (
        |  SELECT o_orderpriority,
        |    CAST(count(*) AS DOUBLE) AS n_orders,
        |    round(sum(o_totalprice), 2) AS total,
        |    CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_custs
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, metric, val
        |FROM w UNPIVOT (val FOR metric IN (n_orders, total, n_custs))
        |ORDER BY o_orderpriority, metric""".stripMargin,

    "lateral_top_order" ->
      """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) l
        |ORDER BY c_custkey""".stripMargin
  )
}
