package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Product/behavioral analytics surface over the `events` stream table —
  * the query family a metrics pipeline grows once per-batch monitoring
  * (SURVEY §2) is in place: range joins against banded dimensions, CDC
  * latest-state compaction, histograms, funnel conversion, retention
  * cohorts, and data-quality profiling.
  *
  * Scale shapes: every plan is either a single keyed shuffle or a
  * broadcast of a constant-size side. No global windows, no driver-side
  * loops; funnel/retention express the sequential dependency as keyed
  * self-joins (co-partitioned on user_id) instead of per-user sorted
  * state, so skewed users split under AQE like any other join key.
  */
object AnalyticsQueries extends QueryPack {

  /** Non-uniform value bands for the range join (a constant dimension —
    * broadcast side). Covers the fixture's value range with deliberately
    * irregular edges so the join is a genuine interval lookup, not a
    * width_bucket in disguise.
    */
  val bands: Seq[(String, Double, Double)] = Seq(
    ("b1_micro", 0.0, 1.0),
    ("b2_small", 1.0, 10.0),
    ("b3_mid", 10.0, 50.0),
    ("b4_large", 50.0, 200.0),
    ("b5_huge", 200.0, 1000.0))

  /** CUSUM allowance denominator (K = T div 4 — a quarter of the hourly
    * mean, in H-scaled deviation units) and alarm threshold multiple.
    */
  private val CusumKDen = 4
  private val CusumAlarmMult = 8
  /** Holt smoothing works in integer micro-units of hourly count. */
  private val HwMicro = 1000000L

  /** Theil–Sen pair lag bound, in hours (H·MaxLag pairs, never H²). */
  private val TheilSenMaxLag = 48

  /** ACF lag range, in hours (covers the fixture's daily period). */
  private val AcfMaxLag = 24

  /** Market-basket floors: min co-purchase count, rule list size. */
  private val BasketMinPair = 3
  private val BasketTopK = 100

  /** MAD anomaly: normal-consistency constant and alarm threshold. */
  private val MadConsistency = 1.4826
  private val MadAlarmZ = 3.0

  /** Binary-segmentation changepoint: minimum segment length, in hours —
    * a level-2 half shorter than a day is noise, not a regime.
    */
  private val BinsegMinSeg = 24

  /** Additive seasonal decomposition core, UNSORTED (the catalog query
    * adds its deterministic output order; ts_anomaly_mad consumes the
    * residual stream mid-plan, where a global sort would be waste).
    */
  /** Positive shift that makes every half-up-division numerator in the
    * decomposition positive — Spark's `div` and DuckDB's `//` agree
    * (truncate == floor) only on positives. Applied to ALL THREE derived
    * series (v6 value mean, s6 seasonal mean, t6 trend mean), not just
    * the trend: v6/s6 numerators are sums of signed inputs too, so a
    * future fixture with negative values would silently diverge between
    * engines if only the trend were shifted (round-10 advice item).
    * Adding M·denominator to the numerator and M back off the quotient
    * is exact — (x + M·y) div y = x div y + M whenever x ≥ 0 — so the
    * shifted spelling is bit-identical on nonnegative data. Must exceed
    * any |mean| micro-value; fixture values are < 1e3 (1e9 micro), so
    * 1e12 leaves 3 orders of headroom.
    */
  private val TrendOffset = 1000000000000L

  /** ALL-INTEGER decomposition: the hourly mean is quantized to micro-
    * units with the doubled-numerator half-up trick
    * round(x/y) = (2x + y) div (2y), and seasonal / trend / residual are
    * derived from those integers exactly — zero float accumulation, so
    * the result is bit-identical across engines, partitionings, and
    * scale factors (the old float-window spelling had a 2-row round(…,6)
    * ulp boundary at sf0.001). The cent-sum is widened to decimal(38,0)
    * before the ×20000 so the micro numerator can't overflow BIGINT at
    * any per-bucket row count; `div` returns bigint.
    */
  private def seasonalDecomposed(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .groupBy(col("event_type"),
        (floor(tsMillis(col("ts")) / 3600000L) * 3600).as("bucket_sec"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("_c"),
        count(col("value")).as("_n"))
      .select(col("event_type"), col("bucket_sec"),
        expr(s"(20000 * cast(_c as decimal(38,0)) + (2 * ${TrendOffset}L + 1) * _n)" +
          s" div (2 * _n) - ${TrendOffset}L").as("v6"))
    val byHod = Window.partitionBy(col("event_type"),
      expr("(bucket_sec div 3600) % 24"))
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("bucket_sec")).rowsBetween(-11, 12)
    hourly
      .withColumn("_sv", sum(col("v6") + lit(TrendOffset)).over(byHod))
      .withColumn("_g", count(lit(1)).over(byHod))
      .withColumn("s6",
        expr(s"(2 * _sv + _g) div (2 * _g) - ${TrendOffset}L"))
      .withColumn("_sd",
        sum(col("v6") - col("s6") + lit(TrendOffset)).over(byType))
      .withColumn("_w", count(lit(1)).over(byType))
      .withColumn("t6",
        expr(s"(2 * _sd + _w) div (2 * _w) - ${TrendOffset}L"))
      .select(col("event_type"), col("bucket_sec"),
        (col("v6").cast("double") / 1e6).as("value"),
        (col("s6").cast("double") / 1e6).as("seasonal"),
        (col("t6").cast("double") / 1e6).as("trend"),
        ((col("v6") - col("s6") - col("t6")).cast("double") / 1e6)
          .as("residual"))
  }

  /** Gap-filled hourly event counts per type (missing hours = 0) — the
    * regular grid the sequential detectors (ts_cusum, ts_holtwinters)
    * need. Shared shape with resample_gapfill_1h: partial-aggregable
    * groupBy first, per-type sequence explode for the grid.
    */
  private def hourlyCounts(s: SparkSession, d: String): DataFrame = {
    val b = events(s, d)
      .groupBy(col("event_type"),
        (floor(tsMillis(col("ts")) / 3600000L) * 3600).as("bucket_sec"))
      .agg(count(lit(1)).as("n"))
    val grid = b.groupBy(col("event_type"))
      .agg(min(col("bucket_sec")).as("_lo"), max(col("bucket_sec")).as("_hi"))
      .select(col("event_type"),
        explode(sequence(col("_lo"), col("_hi"), lit(3600L))).as("bucket_sec"))
    grid.join(b, Seq("event_type", "bucket_sec"), "left")
      .select(col("event_type"), col("bucket_sec"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  private val HistWidth = 25.0
  private val FiveMinMs = 300000L
  private val DayMs = 86400000L
  private val FunnelWindowMs = 43200000L // 12 h per-step conversion window
  private val SessionGapMs = 1800000L    // the catalog's 30-min gap
  private val PathLen = 3                // path prefix length
  private val PathTopK = 50

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Range (interval) join: events -> constant banded dimension on
    // lo <= value < hi. The dimension is O(1) rows at any data scale, so
    // the physical plan is a broadcast nested-loop with a 5-way predicate
    // — per-row constant work, no shuffle of the fact side at all.
    "range_join_value_bands" -> ((s, d) => {
      import s.implicits._
      val dim = bands.toDF("band", "lo", "hi")
      events(s, d)
        .join(broadcast(dim), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"),
          graft.ops.Metrics.meanExact2dp(col("value")).as("avg_value"))
        .orderBy("band")
    }),

    // Binned interval join (ops/RangeJoin): error events matched to click
    // events within ±5 minutes. Unlike range_join_value_bands (broadcast
    // constant dim), BOTH sides here scale with the data, so the naive
    // non-equi join would be a cartesian pairing; binning on 5-minute
    // buckets restores an equi-key (each interval spans ≤ 3 bins) and the
    // plan is an ordinary shuffled hash join — linear, AQE-balanceable.
    "range_join_binned" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("event_type"),
        tsMillis(col("ts")).as("ts_ms"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts_ms").as("click_ts"))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("err_id"),
          (col("ts_ms") - FiveMinMs).as("lo"), (col("ts_ms") + FiveMinMs).as("hi"))
      graft.ops.RangeJoin.binned(clicks, col("click_ts"), errors,
          col("lo"), col("hi"), binWidth = FiveMinMs)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
        .orderBy("err_id")
    }),

    // CDC latest-state compaction: one surviving row per key, newest wins
    // (ts desc, event_id desc tiebreak) — the merge/upsert read path of a
    // changelog. One shuffle on the key; per-key window, never global.
    "cdc_latest_snapshot" -> ((s, d) =>
      events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"), tsMillis(col("ts")).as("ts_ms"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts_ms").desc, col("event_id").desc)))
        .where(col("rk") === 1).drop("rk")
        .orderBy("user_id")),

    // Fixed-width histogram: bucket index is pure arithmetic (no lookup
    // table), so the whole query is one partial-aggregated keyed shuffle
    // with a constant number of groups.
    "histogram_value" -> ((s, d) =>
      events(s, d)
        .groupBy(floor(col("value") / HistWidth).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .withColumn("bucket_lo", round(col("bucket") * HistWidth, 2))
        .select("bucket", "bucket_lo", "n_events", "sum_value")
        .orderBy("bucket")),

    // Funnel conversion click -> view -> purchase, each step within a
    // 12 h window of the previous one: each stage is "earliest qualifying
    // event strictly after (and within FunnelWindowMs of) the previous
    // stage", expressed as a keyed aggregate + join per stage. All three
    // joins hash on user_id — co-partitioned, no global state; the final
    // count is a 1-row rollup.
    "funnel_conversion" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("event_type"), tsMillis(col("ts")).as("ts_ms"))
      val s1 = ev.where(col("event_type") === "click")
        .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t1"))
      val s2 = ev.where(col("event_type") === "view")
        .join(s1, "user_id")
        .where(col("ts_ms") > col("t1") && col("ts_ms") <= col("t1") + FunnelWindowMs)
        .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t2"))
      val s3 = ev.where(col("event_type") === "purchase")
        .join(s2, "user_id")
        .where(col("ts_ms") > col("t2") && col("ts_ms") <= col("t2") + FunnelWindowMs)
        .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t3"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .agg(count(col("t1")).as("n_step1_click"),
          count(col("t2")).as("n_step2_view"),
          count(col("t3")).as("n_step3_purchase"))
    }),

    // Session path analysis: the ordered event-type prefix (first
    // PathLen events) of every 30-min session, counted across sessions —
    // the "how do journeys start" view on top of the sessionize islands.
    // ONE user-keyed exchange serves all three windows (the (user, sid)
    // and rank windows partition by a superset key, so Catalyst reuses
    // the exchange and adds sorts only); the prefix filter drops
    // everything past rank PathLen BEFORE the per-session collect, so
    // no aggregation buffer exceeds PathLen rows; the path count is a
    // path-cardinality-sized shuffle and the top-K a bounded
    // TakeOrdered.
    "session_paths_top" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"), col("event_id"))
      val paths = events(s, d)
        .select(col("user_id"), tsMillis(col("ts")).as("ts_ms"),
          col("event_id"), col("event_type"))
        .withColumn("_new", when(lag(col("ts_ms"), 1).over(byUser).isNull ||
          col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > SessionGapMs,
          1L).otherwise(0L))
        .withColumn("sid", sum(col("_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("sid"))
            .orderBy(col("ts_ms"), col("event_id"))))
        .where(col("rn") <= PathLen)
        .groupBy(col("user_id"), col("sid"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(PathTopK)
    }),

    // Retention cohorts: cohort = first-seen day per user; each cell
    // counts distinct users active at a day offset from their cohort.
    // Two keyed shuffles (first-seen agg, cohort-cell agg) — the join
    // back to activity is on user_id, broadcastable only if the user
    // dimension is small, so it is left to AQE.
    "retention_cohorts" -> ((s, d) => {
      val act = events(s, d)
        .select(col("user_id"), (tsMillis(col("ts")) / DayMs).cast("long").as("day"))
        .distinct()
      val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      act.join(first, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Time-series resampling: hourly buckets per type, the MISSING hours
    // materialized from a per-key sequence (no driver loop), counts
    // gap-filled with 0 and values carried forward (LOCF) by a per-key
    // window. The grid side is O(keys x buckets) — bounded by time range,
    // not row count — and the join is keyed, so the shape survives any
    // fact-table scale.
    "resample_gapfill_1h" -> ((s, d) => {
      val b = events(s, d)
        .groupBy(col("event_type"),
          (floor(tsMillis(col("ts")) / 3600000L) * 3600).as("bucket_sec"))
        .agg(count(lit(1)).as("n_events"),
          graft.ops.Metrics.meanExact2dp(col("value")).as("avg_value"))
      val grid = b.groupBy(col("event_type"))
        .agg(min(col("bucket_sec")).as("_lo"), max(col("bucket_sec")).as("_hi"))
        .select(col("event_type"),
          explode(sequence(col("_lo"), col("_hi"), lit(3600L))).as("bucket_sec"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(b, Seq("event_type", "bucket_sec"), "left")
        .select(col("event_type"), col("bucket_sec"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("avg_value"),
          last(col("avg_value"), ignoreNulls = true).over(w).as("value_locf"))
        .orderBy("event_type", "bucket_sec")
    }),

    // Additive seasonal decomposition (the classic monitoring
    // decomposition: value = seasonal + trend + residual): hour-of-day
    // means give the seasonal component, a centered 24-row rolling mean
    // of the deseasonalized series the trend, the residual is what
    // anomaly detection should run on. Scale shape: the raw events
    // reduce FIRST to the hourly series via a partial-aggregable
    // groupBy; both decomposition windows then run over the AGGREGATED
    // series, whose size is hours×types — independent of event count —
    // so the type-keyed window partitioning is safe at any event volume
    // (unlike anomaly_zscore's raw-row windows, which need time-chunked
    // partitioning).
    "ts_seasonal_decompose" -> ((s, d) =>
      seasonalDecomposed(s, d).orderBy("event_type", "bucket_sec")),

    // Kaplan–Meier survival curve for time-to-first-purchase (hours
    // from a user's first event), right-censored at the corpus end for
    // users who never convert — the churn/conversion estimator. All
    // counting is integer (at-risk via total − running-count-before);
    // the per-step log(1 − d/n) is rounded to micro-units BEFORE the
    // cumulative sum (the BM25 recipe: order-independent integer sum,
    // ln ulps buried behind the rounding), and the curve re-exponates
    // once per emitted row. One user-keyed aggregate + one
    // event-time-keyed window over the (distinct durations)-sized
    // table.
    "survival_km" -> ((s, d) => {
      val perUser = events(s, d)
        .groupBy(col("user_id"))
        .agg(min(tsMillis(col("ts"))).as("_first"),
          min(when(col("event_type") === "purchase", tsMillis(col("ts"))))
            .as("_conv"))
      val ref = events(s, d)
        .agg(max(tsMillis(col("ts"))).as("_ref"))
        .crossJoin(perUser.agg(count(lit(1)).as("_n_users")))
      val durs = perUser.crossJoin(broadcast(ref))
        .select(
          when(col("_conv").isNotNull,
            expr("(_conv - _first) div 3600000"))
            .otherwise(expr("(_ref - _first) div 3600000")).as("t_hours"),
          col("_conv").isNotNull.cast("long").as("evt"), col("_n_users"))
      val byT = durs.groupBy(col("t_hours"))
        .agg(count(lit(1)).as("c_total"), sum(col("evt")).as("d_events"),
          max(col("_n_users")).as("_n"))
      val w = Window.orderBy(col("t_hours"))
        .rowsBetween(Window.unboundedPreceding, -1)
      byT
        .withColumn("n_at_risk",
          col("_n") - coalesce(sum(col("c_total")).over(w), lit(0L)))
        .where(col("d_events") > 0)
        // when n_at_risk == d_events the curve hits EXACTLY zero (ln
        // undefined): flag it and emit surv_micro = 0 from there on
        .withColumn("_l", when(col("n_at_risk") > col("d_events"), expr(
          """cast(round(ln(cast(n_at_risk - d_events as double) / n_at_risk)
            | * 1000000, 0) as bigint)""".stripMargin)).otherwise(lit(0L)))
        .withColumn("_zero", max(
          (col("n_at_risk") === col("d_events")).cast("int")).over(
          Window.orderBy(col("t_hours"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("_ls", sum(col("_l")).over(
          Window.orderBy(col("t_hours"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("t_hours"), col("n_at_risk"), col("d_events"),
          (col("c_total") - col("d_events")).as("c_censored"),
          when(col("_zero") === 1, lit(null).cast("long"))
            .otherwise(col("_ls")).as("log_surv_micro"),
          when(col("_zero") === 1, lit(0L)).otherwise(
            expr("""cast(round(exp(_ls / 1000000.0) * 1000000, 0)
                   | as bigint)""".stripMargin)).as("surv_micro"))
        .orderBy("t_hours")
    }),

    // A/B experiment readout under content-stable hash assignment
    // (variant = first md5 nibble of user_id — exactly how a real
    // bucketing service assigns): Welch's t on purchase values and the
    // two-proportion z on user conversion, computed from sufficient
    // statistics in ONE pass per side (sums / sums of squares / user
    // flags — no per-variant sort, no resampling). Identical formula
    // text both engines; round(6) absorbs last-ulp libm differences.
    "ab_test_welch" -> ((s, d) => {
      val va = substring(md5(col("user_id").cast("string")), 1, 1) < "8"
      // exact 2dp-scaled integer sufficient statistics (the
      // meanExact2dp recipe): sums and sums of squares are longs, so
      // the reduction order cannot move a single ulp; only the final
      // scalar formula is float, on identical inputs in both engines
      val v100 = expr("cast(round(value * 100, 0) as bigint)")
      val pv = events(s, d).where(col("event_type") === "purchase")
        .select(va.cast("int").as("a"), v100.as("v"))
        .agg(
          sum(col("a")).as("n_a"),
          sum(lit(1) - col("a")).as("n_b"),
          sum(when(col("a") === 1, col("v")).otherwise(0L)).as("s_a"),
          sum(when(col("a") === 0, col("v")).otherwise(0L)).as("s_b"),
          sum(when(col("a") === 1, col("v") * col("v")).otherwise(0L))
            .as("q_a"),
          sum(when(col("a") === 0, col("v") * col("v")).otherwise(0L))
            .as("q_b"))
      val cu = events(s, d)
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("long")).as("conv"))
        .select(va.cast("int").as("a"), col("conv"))
        .agg(sum(col("a")).as("u_a"), sum(lit(1) - col("a")).as("u_b"),
          sum(when(col("a") === 1, col("conv")).otherwise(0L)).as("c_a"),
          sum(when(col("a") === 0, col("conv")).otherwise(0L)).as("c_b"))
      pv.crossJoin(cu).select(
        col("n_a"), col("n_b"), col("u_a"), col("u_b"), col("c_a"), col("c_b"),
        // cast before dividing: a decimal literal (100.0 is Decimal(3,1))
        // would make the whole chain decimal128 while the oracle's `/`
        // yields DOUBLE — identical values, different hash representation
        expr("round(cast(s_a as double) / 100.0 / n_a, 6)").as("mean_a"),
        expr("round(cast(s_b as double) / 100.0 / n_b, 6)").as("mean_b"),
        expr("""round((s_a / 100.0 / n_a - s_b / 100.0 / n_b) /
               | sqrt(((q_a / 10000.0 - (s_a / 100.0) * (s_a / 100.0) / n_a)
               |        / (n_a - 1)) / n_a
               |     + ((q_b / 10000.0 - (s_b / 100.0) * (s_b / 100.0) / n_b)
               |        / (n_b - 1)) / n_b), 6)"""
          .stripMargin).as("welch_t"),
        // nullif: a degenerate pooled rate (all or none converted)
        // makes z undefined, not an error
        expr("""round((cast(c_a as double) / u_a - cast(c_b as double) / u_b) /
               | nullif(sqrt((cast(c_a + c_b as double) / (u_a + u_b))
               |     * (1 - cast(c_a + c_b as double) / (u_a + u_b))
               |     * (1.0 / u_a + 1.0 / u_b)), 0.0), 6)""".stripMargin)
          .as("prop_z"))
    }),

    // Market-basket association rules over order lines: part pairs
    // co-purchased in one order, with support / both-direction
    // confidence / lift in integer micro-units. The pair build is the
    // supplier-co-trade shape — per-order self-join bounded by the
    // order's line count (≤7 in TPC-H), so it is linear in lineitem,
    // never quadratic in parts; part supports join back keyed; the
    // order total is a 1-row broadcast. Deterministic top-K by
    // (lift desc, part_a, part_b) via bounded TakeOrdered.
    "market_basket_rules" -> ((s, d) => {
      val li = lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val supp = li.groupBy(col("pk")).agg(count(lit(1)).as("n_p"))
      val nOrders = li.agg(countDistinct(col("ok")).as("n_orders"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
        .agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= BasketMinPair)
      val scored = pairs
        .join(supp.select(col("pk").as("part_a"), col("n_p").as("n_a")), "part_a")
        .join(supp.select(col("pk").as("part_b"), col("n_p").as("n_b")), "part_b")
        .crossJoin(broadcast(nOrders))
        .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"),
          col("n_b"),
          expr("n_ab * 1000000 div n_a").as("conf_ab_micro"),
          expr("n_ab * 1000000 div n_b").as("conf_ba_micro"),
          // widen the numerator to decimal(38,0) before the triple
          // product: n_ab·n_orders·1e6 overflows BIGINT once n_ab
          // approaches n_orders (~sf10); `div` on decimal returns
          // bigint, so the output value and type are unchanged
          expr("cast(n_ab as decimal(38,0)) * n_orders * 1000000" +
            " div (n_a * n_b)").as("lift_micro"))
      scored.orderBy(col("lift_micro").desc, col("part_a"), col("part_b"))
        .limit(BasketTopK) // TakeOrderedAndProject — bounded, no full sort
    }),

    // RFM segmentation (recency / frequency / monetary quartile codes):
    // per-user aggregates bucketed by exact interpolated quartile
    // boundaries — three numbers broadcast onto every row, NOT an
    // ntile over a global sort (the ranking would single-partition at
    // scale; boundary-comparison bucketing is one projection).
    // Reference time = max event time (data-derived, 1-row broadcast).
    "user_rfm" -> ((s, d) => {
      val perUser = events(s, d)
        .groupBy(col("user_id"))
        .agg(max(tsMillis(col("ts"))).as("_last"),
          count(lit(1)).as("frequency"),
          round(sum(col("value")), 2).as("monetary"))
      val ref = perUser.agg(max(col("_last")).as("_ref"))
      val rfm = perUser.crossJoin(broadcast(ref))
        .select(col("user_id"),
          expr("(_ref - _last) div 3600000").as("recency_hours"),
          col("frequency"), col("monetary"))
      val qs = rfm.agg(
        expr("percentile(recency_hours, array(0.25, 0.5, 0.75))").as("_rq"),
        expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("_fq"),
        expr("percentile(monetary, array(0.25, 0.5, 0.75))").as("_mq"))
      def code(c: String, q: String, invert: Boolean) = {
        // quartile code 1..4; recency INVERTED (recent = best = 4)
        val raw = (lit(1) +
          (col(c) > element_at(col(q), 1)).cast("int") +
          (col(c) > element_at(col(q), 2)).cast("int") +
          (col(c) > element_at(col(q), 3)).cast("int"))
        if (invert) lit(5) - raw else raw
      }
      rfm.crossJoin(broadcast(qs))
        .select(col("user_id"), col("recency_hours"), col("frequency"),
          col("monetary"),
          code("recency_hours", "_rq", invert = true).as("r_code"),
          code("frequency", "_fq", invert = false).as("f_code"),
          code("monetary", "_mq", invert = false).as("m_code"))
        .withColumn("rfm",
          col("r_code") * 100 + col("f_code") * 10 + col("m_code"))
        .orderBy("user_id")
    }),

    // CUSUM change-point detection (Page 1954) on the gap-filled hourly
    // event-rate series, ALL-INTEGER: deviations are scaled by the series
    // length (x_t = H·n_t − T sums to zero without ever materializing the
    // mean as a float), the allowance K = T div 4 is a quarter of the
    // hourly mean in the same units, and the sequential recurrence
    // S_t = max(0, S_{t−1} + x_t − K) is rewritten to its closed form
    // S_t = P_t − min(0, min_{j≤t} P_j) over the prefix sums P — so the
    // "inherently sequential" detector becomes two stacked window passes
    // over ONE type-keyed sort (spec-proved equal to the recurrence,
    // including the mirrored downward side). Scale shape: events reduce
    // to the hourly grid via a partial-aggregable groupBy first; every
    // window runs over series-sized data.
    "ts_cusum" -> ((s, d) => {
      val tot = Window.partitionBy(col("event_type"))
      val pre = Window.partitionBy(col("event_type")).orderBy(col("bucket_sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hourlyCounts(s, d)
        .withColumn("_x",
          count(lit(1)).over(tot) * col("n") - sum(col("n")).over(tot))
        .withColumn("_k", expr(s"sum(n) OVER (PARTITION BY event_type) div $CusumKDen"))
        .withColumn("_p", sum(col("_x") - col("_k")).over(pre))
        .withColumn("_q", sum(-col("_x") - col("_k")).over(pre))
        .select(col("event_type"), col("bucket_sec"), col("n"),
          (col("_p") - least(min(col("_p")).over(pre), lit(0L))).as("cusum_up"),
          (col("_q") - least(min(col("_q")).over(pre), lit(0L))).as("cusum_down"),
          ((col("_p") - least(min(col("_p")).over(pre), lit(0L))) >
            col("_k") * CusumAlarmMult).cast("int").as("alarm_up"),
          ((col("_q") - least(min(col("_q")).over(pre), lit(0L))) >
            col("_k") * CusumAlarmMult).cast("int").as("alarm_down"))
        .orderBy("event_type", "bucket_sec")
    }),

    // Binary-segmentation changepoint detection (the top of the classic
    // changepoint ladder — Scott & Knott / binseg, the greedy
    // approximation to PELT): level 1 finds, per type, the split k that
    // maximizes the integer CUSUM deviation |H·S_k − k·S_H| over the
    // gap-filled hourly series (the n-scaled spelling keeps everything
    // in BIGINT — no mean, no floats); level 2 recurses once into each
    // half (own local cumsums), a half shorter than BinsegMinSeg hours
    // reports nothing. Ties break to the earliest split in both
    // engines. ALL-INTEGER, so the oracle compare is exact. Scale
    // shape: events reduce to the hourly grid first (partial-aggregable
    // groupBy); every window and argmax runs over series-sized data,
    // level 2 over (type, side)-keyed windows — the recursion depth is
    // a constant 2, never data-dependent.
    "ts_changepoint_binseg" -> ((s, d) => {
      val byT = Window.partitionBy(col("event_type"))
      val byTOrd = byT.orderBy(col("bucket_sec"))
      val ser = hourlyCounts(s, d)
        .withColumn("k", row_number().over(byTOrd))
        .withColumn("sk", sum(col("n")).over(byTOrd))
        .withColumn("h", count(lit(1)).over(byT))
        .withColumn("sn", sum(col("n")).over(byT))
      val s1 = ser.where(col("k") < col("h"))
        .withColumn("stat", abs(col("h") * col("sk") - col("k") * col("sn")))
        .withColumn("_rn", row_number().over(
          byT.orderBy(col("stat").desc, col("k"))))
        .where(col("_rn") === 1)
        .select(col("event_type"), col("k").as("k1"),
          col("bucket_sec").as("b1"), col("stat").as("st1"))
      val bySide = Window.partitionBy(col("event_type"), col("side"))
      val bySideOrd = bySide.orderBy(col("bucket_sec"))
      val l2 = ser
        .join(s1.select(col("event_type"), col("k1")), Seq("event_type"))
        .withColumn("side",
          when(col("k") <= col("k1"), lit("left")).otherwise(lit("right")))
        .withColumn("j", row_number().over(bySideOrd))
        .withColumn("tj", sum(col("n")).over(bySideOrd))
        .withColumn("m", count(lit(1)).over(bySide))
        .withColumn("tm", sum(col("n")).over(bySide))
        .where(col("j") < col("m") && col("m") >= BinsegMinSeg)
        .withColumn("stat", abs(col("m") * col("tj") - col("j") * col("tm")))
        .withColumn("_rn", row_number().over(
          bySide.orderBy(col("stat").desc, col("j"))))
        .where(col("_rn") === 1)
        .select(col("event_type"), lit(2).as("level"), col("side").as("seg"),
          col("bucket_sec").as("split_bucket_sec"), col("stat"))
      s1.select(col("event_type"), lit(1).as("level"), lit("all").as("seg"),
          col("b1").as("split_bucket_sec"), col("st1").as("stat"))
        .unionByName(l2)
        .orderBy("event_type", "level", "seg")
    }),

    // Robust anomaly detection on the seasonal residuals: the
    // decomposition's residual stream scored by the MAD z-score
    // (median / 1.4826·MAD — outlier-immune where mean/stddev are
    // not), alarming above 3σ-equivalent. Composes the monitoring
    // family end-to-end: decompose → robust scale → alarm. The two
    // median passes are per-type exact percentiles (5-row broadcast
    // back); everything else rides the decomposition's series-sized
    // windows.
    "ts_anomaly_mad" -> ((s, d) => {
      val dec = seasonalDecomposed(s, d)
        .select(col("event_type"), col("bucket_sec"), col("value"),
          col("residual"))
      val med = dec.groupBy(col("event_type"))
        .agg(expr("percentile(residual, 0.5)").as("med"))
      val withMed = dec.join(broadcast(med), Seq("event_type"))
      val mad = withMed.groupBy(col("event_type"))
        .agg(expr("percentile(abs(residual - med), 0.5)").as("mad"))
      withMed.join(broadcast(mad), Seq("event_type"))
        .where(abs(col("residual") - col("med")) >
          lit(MadAlarmZ) * lit(MadConsistency) * col("mad"))
        .select(col("event_type"), col("bucket_sec"), col("value"),
          col("residual"),
          round((col("residual") - col("med")) /
            (lit(MadConsistency) * col("mad")), 4).as("robust_z"))
        .orderBy("event_type", "bucket_sec")
    }),

    // Theil–Sen robust trend per type: the median of pairwise slopes,
    // immune to the outliers that wreck least-squares — with the
    // BOUNDED-LAG restriction (pairs at most TheilSenMaxLag hours
    // apart) that turns the O(H²) all-pairs classic into H·MaxLag
    // work, expressed as a constant 48-row lag dimension + an exact
    // equi-join back onto the series (no range join, no self cross).
    // Slopes are integer micro-units (events/hour); the median is the
    // exact interpolated percentile (the proven percentile ↔
    // quantile_cont pairing).
    "ts_theilsen" -> ((s, d) => {
      import s.implicits._
      val hourly = hourlyCounts(s, d)
      val lags = (1 to TheilSenMaxLag).toDF("lag")
      val later = hourly.select(col("event_type"),
        col("bucket_sec").as("b2"), col("n").as("n2"))
      hourly.crossJoin(broadcast(lags))
        .select(col("event_type"), col("n"),
          (col("bucket_sec") + col("lag") * 3600L).as("b2"), col("lag"))
        .join(later, Seq("event_type", "b2"))
        .select(col("event_type"),
          expr("(n2 - n) * 1000000 div lag").as("slope_micro"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(slope_micro, 0.5)"), 6)
            .as("median_slope_micro"))
        .orderBy("event_type")
    }),

    // Autocorrelation function at lags 1..24 per type over the
    // gap-filled hourly counts — the seasonality/memory diagnostic
    // that motivates the decomposition's 24-hour period. Deviations
    // are the CUSUM trick's H-scaled integers (x = H·n − T, Σx = 0 —
    // no float mean), lag pairing is the Theil–Sen constant-lag-
    // dimension equi-join, and numerator/denominator are exact integer
    // sums; only the final ratio is float, on identical inputs.
    "ts_autocorrelation" -> ((s, d) => {
      import s.implicits._
      val tot = Window.partitionBy(col("event_type"))
      val dev = hourlyCounts(s, d)
        .withColumn("x",
          count(lit(1)).over(tot) * col("n") - sum(col("n")).over(tot))
      val den = dev.groupBy(col("event_type"))
        .agg(sum(col("x") * col("x")).as("den"))
      val lags = (1 to AcfMaxLag).toDF("lag")
      val later = dev.select(col("event_type"), col("bucket_sec").as("b2"),
        col("x").as("x2"))
      dev.crossJoin(broadcast(lags))
        .select(col("event_type"), col("x"), col("lag"),
          (col("bucket_sec") + col("lag") * 3600L).as("b2"))
        .join(later, Seq("event_type", "b2"))
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n_terms"), sum(col("x") * col("x2")).as("num"))
        .join(broadcast(den), Seq("event_type"))
        .select(col("event_type"), col("lag").cast("long").as("lag"),
          col("n_terms"),
          // nullif: a constant series (all hourly counts equal) gives
          // den = 0, where Spark's / returns NULL but DuckDB under
          // ieee_floating_point_ops returns Inf/NaN — guard both sides
          expr("round(cast(num as double) / nullif(den, 0), 6)").as("acf"))
        .orderBy("event_type", "lag")
    }),

    // Holt's linear-trend exponential smoothing (the level+trend half of
    // Holt-Winters) over the gap-filled hourly counts, in integer
    // micro-units: l_t = (2·y_t + 8·(l+b)) div 10, b_t = (Δl + 9·b) div 10
    // (α=0.2, β=0.1 as exact rationals; div truncates toward zero
    // identically in Spark and DuckDB, spec-covered for negative trends).
    // The recurrence is genuinely sequential, but the SERIES is the
    // aggregated hourly grid — so it runs as one `aggregate` fold over a
    // per-type collected array (hours-sized, independent of event
    // volume), never as driver-side iteration; the oracle replays the
    // identical fold with DuckDB list_reduce. Emits the smoothed state
    // and the 1/2/3-step-ahead forecasts l + h·b.
    "ts_holtwinters" -> ((s, d) => {
      val ser = hourlyCounts(s, d)
        .groupBy(col("event_type"))
        .agg(transform(sort_array(collect_list(struct(col("bucket_sec"), col("n")))),
          r => r.getField("n") * HwMicro).as("_ys"))
        .where(size(col("_ys")) >= 2)
      def tdiv(a: Column, den: Long): Column = ((a - a % den) / den).cast("long")
      def level(acc: Column, y: Column): Column =
        tdiv(y * 2L + (acc.getField("l") + acc.getField("b")) * 8L, 10L)
      ser.select(col("event_type"), size(col("_ys")).cast("long").as("n_hours"),
          aggregate(
            slice(col("_ys"), lit(2), size(col("_ys")) - 1),
            struct(element_at(col("_ys"), 1).as("l"),
              (element_at(col("_ys"), 2) - element_at(col("_ys"), 1)).as("b")),
            (acc, y) => struct(level(acc, y).as("l"),
              tdiv(level(acc, y) - acc.getField("l") + acc.getField("b") * 9L, 10L)
                .as("b"))).as("_st"))
        .select(col("event_type"), col("n_hours"),
          col("_st.l").as("level_micro"), col("_st.b").as("trend_micro"),
          (col("_st.l") + col("_st.b")).as("fc1_micro"),
          (col("_st.l") + col("_st.b") * 2L).as("fc2_micro"),
          (col("_st.l") + col("_st.b") * 3L).as("fc3_micro"))
        .orderBy("event_type")
    }),

    // Incremental-rollup equivalence (materialized-view maintenance): the
    // day-partial -> merge path must equal the direct global aggregate for
    // algebraic functions — the property that lets a 100 TB pipeline
    // re-aggregate only new partitions and fold them into yesterday's
    // state. The ORACLE is the direct computation, so the equality is the
    // correctness gate itself.
    "incremental_two_level_agg" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          (tsMillis(col("ts")) / DayMs).cast("long").as("day"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
          min(col("value")).as("mn"), max(col("value")).as("mx"))
      daily.groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_events"),
          round(sum(col("sv")), 2).as("sum_value"),
          round(min(col("mn")), 2).as("min_value"),
          round(max(col("mx")), 2).as("max_value"))
        .orderBy("event_type")
    }),

    // Time-series similarity (the EDBT'19 streaming-similarity shape,
    // exact flavor): hourly count series per event type, pairwise Pearson
    // correlation over the co-occurring buckets. The series aggregate is
    // one keyed shuffle; the pairwise stage joins SERIES-sized frames
    // (buckets × types — bounded by time range, not event count), so the
    // quadratic part never touches the fact table.
    "ts_similarity_types" -> ((s, d) => {
      val b = events(s, d)
        .groupBy(col("event_type"),
          floor(tsMillis(col("ts")) / 3600000L).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val l = b.select(col("event_type").as("type_a"), col("bucket"), col("n").as("na"))
      val r = b.select(col("event_type").as("type_b"), col("bucket"), col("n").as("nb"))
      l.join(r, Seq("bucket"))
        .where(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        // + 0.0 canonicalizes IEEE -0.0: a near-uncorrelated pair's corr
        // numerator is fp noise around zero whose SIGN depends on the
        // (parallel) accumulation order — observed as a DuckDB-side
        // -0.0/0.0 hash flip between runs
        .agg((round(corr(col("na"), col("nb")), 6) + lit(0.0)).as("corr_n"),
          count(lit(1)).as("n_buckets"))
        .orderBy("type_a", "type_b")
    }),

    // Data-quality profile: per-column completeness + cardinality in ONE
    // scan (multi-distinct expands internally; at 100 TB swap the exact
    // count_distinct for approx_count_distinct — same plan shape, sketch
    // state instead of value shuffle), unpivoted with stack().
    // Data-quality EXPECTATION suite (the dbt-tests / Great Expectations
    // shape): named assertions over the orders table, each emitting its
    // violation count and pass flag — the contract a pipeline gates a
    // new drop on, where dq_profile merely describes it. Four in-row
    // expectations fold into ONE conditional-aggregate pass; referential
    // integrity is one anti-join count against the broadcastable
    // customer dimension. Exact integers everywhere.
    "dq_expectations" -> ((s, d) => {
      val o = orders(s, d)
      val inRow = o.agg(
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_notnull"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_unique"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L)
          .otherwise(0L)).as("v_accepted"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_range"))
      val orphan = o.join(customer(s, d)
          .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"),
          "left_anti")
        .agg(count(lit(1)).as("v_ref"))
      inRow.crossJoin(broadcast(orphan))
        .select(explode(array(
          struct(lit("not_null_o_orderkey").as("expectation"),
            col("v_notnull").as("n_violations")),
          struct(lit("unique_o_orderkey").as("expectation"),
            col("v_unique").as("n_violations")),
          struct(lit("accepted_values_o_orderstatus").as("expectation"),
            col("v_accepted").as("n_violations")),
          struct(lit("positive_o_totalprice").as("expectation"),
            col("v_range").as("n_violations")),
          struct(lit("ref_integrity_o_custkey").as("expectation"),
            col("v_ref").as("n_violations")))).as("r"))
        .select(col("r.expectation"), col("r.n_violations"),
          (col("r.n_violations") === 0L).as("pass"))
        .orderBy("expectation")
    }),

    "dq_profile" -> ((s, d) => {
      val cols = Seq("event_id", "user_id", "event_type", "value", "props")
      val aggs = count(lit(1)).as("n_rows") +:
        cols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c")))
      val stacked = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
      events(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr("n_rows",
          s"stack(${cols.size}, $stacked) AS (col_name, n_nonnull, n_distinct)")
        .select("col_name", "n_rows", "n_nonnull", "n_distinct")
        .orderBy("col_name")
    }))

  def oracleSql: Map[String, String] = {
    val bandValues = bands.map { case (b, lo, hi) => s"('$b', $lo, $hi)" }.mkString(", ")
    val profileCols = Seq("event_id", "user_id", "event_type", "value", "props")
    // Seasonal-decomposition chain ending in `tr` (event_type,
    // bucket_sec, v, seasonal, trend) — shared by the decompose and
    // MAD-anomaly oracles.
    // All-integer mirror of [[seasonalDecomposed]]: micro-unit half-up
    // quantization via (2x + y) // (2y) on POSITIVE numerators (the
    // TrendOffset shift keeps ALL numerators — value mean, seasonal
    // mean, centered trend sum — positive; Spark div and DuckDB //
    // agree only there). DuckDB's sum(BIGINT) widens to HUGEINT, so
    // the ×20000 numerator can't overflow.
    val duckSeasonalTr =
      s"""b AS (
         |  SELECT event_type, (epoch_ms(ts) // 3600000) * 3600 AS bucket_sec,
         |    (20000 * sum(CAST(round(value * 100) AS BIGINT))
         |       + (2 * $TrendOffset + 1) * count(value))
         |      // (2 * count(value)) - $TrendOffset AS v6
         |  FROM events GROUP BY 1, 2),
         |se AS (
         |  SELECT event_type, bucket_sec, v6,
         |    (2 * sum(v6 + $TrendOffset) OVER hod + count(*) OVER hod)
         |      // (2 * count(*) OVER hod) - $TrendOffset AS s6
         |  FROM b
         |  WINDOW hod AS (PARTITION BY event_type, (bucket_sec // 3600) % 24)),
         |t0 AS (
         |  SELECT event_type, bucket_sec, v6, s6,
         |    (2 * sum(v6 - s6 + $TrendOffset) OVER w + count(*) OVER w)
         |      // (2 * count(*) OVER w) - $TrendOffset AS t6
         |  FROM se
         |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_sec
         |    ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)),
         |tr AS (
         |  SELECT event_type, bucket_sec,
         |    CAST(v6 AS DOUBLE) / 1000000 AS v,
         |    CAST(s6 AS DOUBLE) / 1000000 AS seasonal,
         |    CAST(t6 AS DOUBLE) / 1000000 AS trend,
         |    CAST(v6 - s6 - t6 AS DOUBLE) / 1000000 AS residual
         |  FROM t0)""".stripMargin
    // Gap-filled hourly counts per type — mirrors [[hourlyCounts]].
    val duckHourlyCounts =
      """hb AS (SELECT event_type, (epoch_ms(ts) // 3600000) * 3600 AS bucket_sec,
        |         count(*) AS n FROM events GROUP BY 1, 2),
        |hg AS (SELECT event_type,
        |         unnest(generate_series(min(bucket_sec), max(bucket_sec), 3600))
        |           AS bucket_sec
        |       FROM hb GROUP BY event_type),
        |hc AS (SELECT hg.event_type, hg.bucket_sec, coalesce(hb.n, 0) AS n
        |       FROM hg LEFT JOIN hb USING (event_type, bucket_sec))""".stripMargin
    Map(
      "session_paths_top" ->
        s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
           |  event_type FROM events),
           |marked AS (
           |  SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
           |      OR ts_ms - lag(ts_ms) OVER w > $SessionGapMs THEN 1 ELSE 0
           |    END AS is_new
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
           |sess AS (
           |  SELECT *, sum(is_new) OVER (PARTITION BY user_id
           |      ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM marked),
           |r AS (SELECT user_id, sid, event_type,
           |    row_number() OVER (PARTITION BY user_id, sid
           |      ORDER BY ts_ms, event_id) AS rn
           |  FROM sess),
           |p AS (SELECT user_id, sid,
           |    string_agg(event_type, '>' ORDER BY rn) AS path
           |  FROM r WHERE rn <= $PathLen GROUP BY 1, 2)
           |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
           |FROM p GROUP BY 1
           |ORDER BY n_sessions DESC, path LIMIT $PathTopK""".stripMargin,

      "dq_expectations" ->
        """WITH inrow AS (SELECT
          |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS v_notnull,
          |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_unique,
          |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
          |    THEN 1 ELSE 0 END) AS BIGINT) AS v_accepted,
          |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS v_range
          |  FROM orders),
          |orphan AS (SELECT CAST(count(*) AS BIGINT) AS v_ref FROM orders o
          |  WHERE NOT EXISTS (SELECT 1 FROM customer c
          |    WHERE c.c_custkey = o.o_custkey)),
          |x AS (SELECT 'not_null_o_orderkey' AS expectation,
          |    v_notnull AS n_violations FROM inrow
          |  UNION ALL SELECT 'unique_o_orderkey', v_unique FROM inrow
          |  UNION ALL SELECT 'accepted_values_o_orderstatus', v_accepted
          |    FROM inrow
          |  UNION ALL SELECT 'positive_o_totalprice', v_range FROM inrow
          |  UNION ALL SELECT 'ref_integrity_o_custkey', v_ref FROM orphan)
          |SELECT expectation, n_violations, n_violations = 0 AS pass
          |FROM x ORDER BY expectation""".stripMargin,

      "range_join_binned" ->
        """WITH e AS (SELECT event_id, event_type, epoch_ms(ts) AS ts_ms
           |           FROM events)
           |SELECT er.event_id AS err_id, count(*) AS n_clicks,
           |       min(c.event_id) AS first_click
           |FROM e er JOIN e c
           |  ON er.event_type = 'error' AND c.event_type = 'click'
           | AND c.ts_ms BETWEEN er.ts_ms - 300000 AND er.ts_ms + 300000
           |GROUP BY er.event_id ORDER BY err_id""".stripMargin,

      "range_join_value_bands" ->
        s"""WITH bands(band, lo, hi) AS (VALUES $bandValues)
           |SELECT band, count(*) AS n_events,
           |  round(sum(value), 2) AS sum_value,
           |  ${graft.ops.Metrics.meanExact2dpSql("value")} AS avg_value
           |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
           |GROUP BY band ORDER BY band""".stripMargin,

      "cdc_latest_snapshot" ->
        """SELECT user_id, event_id, event_type, round(value, 2) AS value,
          |  epoch_ms(ts) AS ts_ms
          |FROM events
          |QUALIFY row_number() OVER (PARTITION BY user_id
          |                           ORDER BY epoch_ms(ts) DESC, event_id DESC) = 1
          |ORDER BY user_id""".stripMargin,

      "histogram_value" ->
        s"""SELECT CAST(floor(value / $HistWidth) AS BIGINT) AS bucket,
           |  round(CAST(floor(value / $HistWidth) AS BIGINT) * $HistWidth, 2) AS bucket_lo,
           |  count(*) AS n_events, round(sum(value), 2) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY bucket""".stripMargin,

      "funnel_conversion" ->
        s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
          |s1 AS (SELECT user_id, min(ts_ms) AS t1 FROM e
          |       WHERE event_type = 'click' GROUP BY user_id),
          |s2 AS (SELECT e.user_id, min(e.ts_ms) AS t2 FROM e JOIN s1 USING (user_id)
          |       WHERE e.event_type = 'view' AND e.ts_ms > s1.t1
          |         AND e.ts_ms <= s1.t1 + $FunnelWindowMs GROUP BY e.user_id),
          |s3 AS (SELECT e.user_id, min(e.ts_ms) AS t3 FROM e JOIN s2 USING (user_id)
          |       WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t2
          |         AND e.ts_ms <= s2.t2 + $FunnelWindowMs GROUP BY e.user_id)
          |SELECT (SELECT count(*) FROM s1) AS n_step1_click,
          |       (SELECT count(*) FROM s2) AS n_step2_view,
          |       (SELECT count(*) FROM s3) AS n_step3_purchase""".stripMargin,

      "retention_cohorts" ->
        s"""WITH act AS (SELECT DISTINCT user_id, epoch_ms(ts) // $DayMs AS day FROM events),
           |first AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id)
           |SELECT cohort_day, day - cohort_day AS day_offset,
           |  count(DISTINCT act.user_id) AS n_users
           |FROM act JOIN first USING (user_id)
           |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

      "ts_seasonal_decompose" ->
        s"""WITH $duckSeasonalTr
           |SELECT event_type, bucket_sec, v AS value,
           |  seasonal, trend, residual
           |FROM tr ORDER BY event_type, bucket_sec""".stripMargin,

      "ts_anomaly_mad" ->
        s"""WITH $duckSeasonalTr,
           |dc AS (SELECT event_type, bucket_sec, v AS value, residual
           |  FROM tr),
           |md AS (SELECT event_type, quantile_cont(residual, 0.5) AS med
           |  FROM dc GROUP BY 1),
           |m2 AS (SELECT dc.*, med FROM dc JOIN md USING (event_type)),
           |m3 AS (SELECT event_type,
           |    quantile_cont(abs(residual - med), 0.5) AS mad
           |  FROM m2 GROUP BY 1)
           |SELECT m2.event_type, bucket_sec, value, residual,
           |  round((residual - med) / ($MadConsistency * mad), 4) AS robust_z
           |FROM m2 JOIN m3 USING (event_type)
           |WHERE abs(residual - med) > $MadAlarmZ * $MadConsistency * mad
           |ORDER BY event_type, bucket_sec""".stripMargin,

      "ts_cusum" ->
        s"""WITH $duckHourlyCounts,
           |st AS (SELECT event_type, bucket_sec, n,
           |    count(*) OVER (PARTITION BY event_type) AS h,
           |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS t
           |  FROM hc),
           |pf AS (SELECT event_type, bucket_sec, n, t // $CusumKDen AS k,
           |    CAST(sum(h * n - t - t // $CusumKDen) OVER w AS BIGINT) AS p,
           |    CAST(sum(-(h * n - t) - t // $CusumKDen) OVER w AS BIGINT) AS q
           |  FROM st WINDOW w AS (PARTITION BY event_type ORDER BY bucket_sec
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           |SELECT event_type, bucket_sec, n,
           |  p - least(CAST(min(p) OVER w AS BIGINT), 0) AS cusum_up,
           |  q - least(CAST(min(q) OVER w AS BIGINT), 0) AS cusum_down,
           |  CAST(p - least(CAST(min(p) OVER w AS BIGINT), 0)
           |       > k * $CusumAlarmMult AS INT) AS alarm_up,
           |  CAST(q - least(CAST(min(q) OVER w AS BIGINT), 0)
           |       > k * $CusumAlarmMult AS INT) AS alarm_down
           |FROM pf WINDOW w AS (PARTITION BY event_type ORDER BY bucket_sec
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |ORDER BY event_type, bucket_sec""".stripMargin,

      // Binseg mirror: same integer CUSUM-deviation argmaxes; sums cast
      // to BIGINT (DuckDB widens sum(BIGINT) to HUGEINT, Spark stays
      // long) so the stat column types match; QUALIFY-after-WHERE equals
      // Spark's filter-before-rank ordering.
      "ts_changepoint_binseg" ->
        s"""WITH $duckHourlyCounts,
           |ser AS (SELECT event_type, bucket_sec, n,
           |    row_number() OVER w AS k,
           |    CAST(sum(n) OVER w AS BIGINT) AS sk,
           |    count(*) OVER (PARTITION BY event_type) AS h,
           |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS sn
           |  FROM hc
           |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_sec
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |s1 AS (SELECT event_type, k AS k1, bucket_sec AS b1,
           |    CAST(abs(h * sk - k * sn) AS BIGINT) AS st1
           |  FROM ser WHERE k < h
           |  QUALIFY row_number() OVER (PARTITION BY event_type
           |    ORDER BY abs(h * sk - k * sn) DESC, k) = 1),
           |halves AS (SELECT ser.event_type, ser.bucket_sec, ser.n,
           |    CASE WHEN ser.k <= s1.k1 THEN 'left' ELSE 'right' END AS side
           |  FROM ser JOIN s1 USING (event_type)),
           |l2w AS (SELECT event_type, side, bucket_sec,
           |    row_number() OVER w2 AS j,
           |    CAST(sum(n) OVER w2 AS BIGINT) AS tj,
           |    count(*) OVER (PARTITION BY event_type, side) AS m,
           |    CAST(sum(n) OVER (PARTITION BY event_type, side) AS BIGINT)
           |      AS tm
           |  FROM halves
           |  WINDOW w2 AS (PARTITION BY event_type, side ORDER BY bucket_sec
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |l2r AS (SELECT event_type, side AS seg,
           |    bucket_sec AS split_bucket_sec,
           |    CAST(abs(m * tj - j * tm) AS BIGINT) AS stat
           |  FROM l2w WHERE j < m AND m >= $BinsegMinSeg
           |  QUALIFY row_number() OVER (PARTITION BY event_type, side
           |    ORDER BY abs(m * tj - j * tm) DESC, j) = 1)
           |SELECT event_type, CAST(1 AS INT) AS level, 'all' AS seg,
           |  b1 AS split_bucket_sec, st1 AS stat FROM s1
           |UNION ALL
           |SELECT event_type, CAST(2 AS INT) AS level, seg,
           |  split_bucket_sec, stat FROM l2r
           |ORDER BY event_type, level, seg""".stripMargin,

      "survival_km" ->
        """WITH pu AS (SELECT user_id, min(epoch_ms(ts)) AS first_ms,
          |    min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END)
          |      AS conv_ms
          |  FROM events GROUP BY 1),
          |rf AS (SELECT (SELECT max(epoch_ms(ts)) FROM events) AS ref_ms,
          |    (SELECT count(*) FROM pu) AS n_users),
          |du AS (SELECT
          |    CASE WHEN conv_ms IS NOT NULL
          |      THEN (conv_ms - first_ms) // 3600000
          |      ELSE (ref_ms - first_ms) // 3600000 END AS t_hours,
          |    CAST(conv_ms IS NOT NULL AS BIGINT) AS evt, n_users
          |  FROM pu, rf),
          |bt AS (SELECT t_hours, CAST(count(*) AS BIGINT) AS c_total,
          |    CAST(sum(evt) AS BIGINT) AS d_events,
          |    max(n_users) AS n FROM du GROUP BY 1),
          |ar AS (SELECT t_hours, c_total, d_events,
          |    n - CAST(coalesce(sum(c_total) OVER (ORDER BY t_hours
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS BIGINT) AS n_at_risk
          |  FROM bt),
          |lg AS (SELECT t_hours, n_at_risk, d_events,
          |    c_total - d_events AS c_censored,
          |    CAST(sum(CASE WHEN n_at_risk > d_events THEN
          |        CAST(round(ln(CAST(n_at_risk - d_events AS DOUBLE)
          |          / n_at_risk) * 1000000, 0) AS BIGINT) ELSE 0 END)
          |      OVER (ORDER BY t_hours
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS ls,
          |    max(CASE WHEN n_at_risk = d_events THEN 1 ELSE 0 END)
          |      OVER (ORDER BY t_hours
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zf
          |  FROM ar WHERE d_events > 0)
          |SELECT t_hours, n_at_risk, d_events, c_censored,
          |  CASE WHEN zf = 1 THEN NULL ELSE ls END AS log_surv_micro,
          |  CASE WHEN zf = 1 THEN 0
          |       ELSE CAST(round(exp(ls / 1000000.0) * 1000000, 0) AS BIGINT)
          |  END AS surv_micro
          |FROM lg ORDER BY t_hours""".stripMargin,

      "ab_test_welch" ->
        """WITH pe AS (SELECT
          |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
          |      THEN 1 ELSE 0 END AS a,
          |    CAST(round(value * 100, 0) AS BIGINT) AS v
          |  FROM events WHERE event_type = 'purchase'),
          |pv AS (SELECT
          |    CAST(sum(a) AS BIGINT) AS n_a,
          |    CAST(sum(1 - a) AS BIGINT) AS n_b,
          |    CAST(sum(CASE WHEN a = 1 THEN v ELSE 0 END) AS BIGINT) AS s_a,
          |    CAST(sum(CASE WHEN a = 0 THEN v ELSE 0 END) AS BIGINT) AS s_b,
          |    CAST(sum(CASE WHEN a = 1 THEN v * v ELSE 0 END) AS BIGINT) AS q_a,
          |    CAST(sum(CASE WHEN a = 0 THEN v * v ELSE 0 END) AS BIGINT) AS q_b
          |  FROM pe),
          |uc AS (SELECT user_id,
          |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
          |  FROM events GROUP BY 1),
          |cu AS (SELECT
          |    CAST(sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
          |      < '8' THEN 1 ELSE 0 END) AS BIGINT) AS u_a,
          |    CAST(sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
          |      >= '8' THEN 1 ELSE 0 END) AS BIGINT) AS u_b,
          |    CAST(sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
          |      < '8' THEN conv ELSE 0 END) AS BIGINT) AS c_a,
          |    CAST(sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
          |      >= '8' THEN conv ELSE 0 END) AS BIGINT) AS c_b
          |  FROM uc)
          |SELECT n_a, n_b, u_a, u_b, c_a, c_b,
          |  round(s_a / 100.0 / n_a, 6) AS mean_a,
          |  round(s_b / 100.0 / n_b, 6) AS mean_b,
          |  round((s_a / 100.0 / n_a - s_b / 100.0 / n_b) /
          |    sqrt(((q_a / 10000.0 - (s_a / 100.0) * (s_a / 100.0) / n_a)
          |           / (n_a - 1)) / n_a
          |        + ((q_b / 10000.0 - (s_b / 100.0) * (s_b / 100.0) / n_b)
          |           / (n_b - 1)) / n_b), 6) AS welch_t,
          |  round((CAST(c_a AS DOUBLE) / u_a - CAST(c_b AS DOUBLE) / u_b) /
          |    nullif(sqrt((CAST(c_a + c_b AS DOUBLE) / (u_a + u_b))
          |        * (1 - CAST(c_a + c_b AS DOUBLE) / (u_a + u_b))
          |        * (1.0 / u_a + 1.0 / u_b)), 0.0), 6) AS prop_z
          |FROM pv, cu""".stripMargin,

      "market_basket_rules" ->
        s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           |  FROM lineitem),
           |supp AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_p
           |  FROM li GROUP BY 1),
           |no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders
           |  FROM li),
           |pr AS (SELECT a.pk AS part_a, b.pk AS part_b,
           |    CAST(count(*) AS BIGINT) AS n_ab
           |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           |  GROUP BY 1, 2 HAVING count(*) >= $BasketMinPair)
           |SELECT part_a, part_b, n_ab, sa.n_p AS n_a, sb.n_p AS n_b,
           |  n_ab * 1000000 // sa.n_p AS conf_ab_micro,
           |  n_ab * 1000000 // sb.n_p AS conf_ba_micro,
           |  CAST(n_ab::HUGEINT * n_orders * 1000000
           |       // (sa.n_p * sb.n_p) AS BIGINT) AS lift_micro
           |FROM pr JOIN supp sa ON sa.pk = part_a
           |        JOIN supp sb ON sb.pk = part_b, no
           |ORDER BY lift_micro DESC, part_a, part_b
           |LIMIT $BasketTopK""".stripMargin,

      "user_rfm" ->
        s"""WITH pu AS (SELECT user_id, max(epoch_ms(ts)) AS last_ms,
           |    CAST(count(*) AS BIGINT) AS frequency,
           |    round(sum(value), 2) AS monetary
           |  FROM events GROUP BY 1),
           |rf AS (SELECT user_id,
           |    (SELECT max(last_ms) FROM pu) - last_ms AS rgap,
           |    frequency, monetary FROM pu),
           |rfm AS (SELECT user_id, rgap // 3600000 AS recency_hours,
           |    frequency, monetary FROM rf),
           |q AS (SELECT
           |    quantile_cont(recency_hours, [0.25, 0.5, 0.75]) AS rq,
           |    quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
           |    quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mq
           |  FROM rfm),
           |coded AS (SELECT user_id, recency_hours, frequency, monetary,
           |    5 - (1 + CAST(recency_hours > rq[1] AS INT)
           |           + CAST(recency_hours > rq[2] AS INT)
           |           + CAST(recency_hours > rq[3] AS INT)) AS r_code,
           |    1 + CAST(frequency > fq[1] AS INT)
           |      + CAST(frequency > fq[2] AS INT)
           |      + CAST(frequency > fq[3] AS INT) AS f_code,
           |    1 + CAST(monetary > mq[1] AS INT)
           |      + CAST(monetary > mq[2] AS INT)
           |      + CAST(monetary > mq[3] AS INT) AS m_code
           |  FROM rfm, q)
           |SELECT user_id, recency_hours, frequency, monetary,
           |  r_code, f_code, m_code,
           |  r_code * 100 + f_code * 10 + m_code AS rfm
           |FROM coded ORDER BY user_id""".stripMargin,

      "ts_autocorrelation" ->
        s"""WITH $duckHourlyCounts,
           |dv AS (SELECT event_type, bucket_sec,
           |    count(*) OVER (PARTITION BY event_type) * n
           |      - CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS x
           |  FROM hc),
           |dn AS (SELECT event_type, CAST(sum(x * x) AS BIGINT) AS den
           |  FROM dv GROUP BY 1),
           |nm AS (SELECT d1.event_type, g.lag,
           |    CAST(count(*) AS BIGINT) AS n_terms,
           |    CAST(sum(d1.x * d2.x) AS BIGINT) AS num
           |  FROM dv d1
           |  CROSS JOIN (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag) g
           |  JOIN dv d2 ON d2.event_type = d1.event_type
           |    AND d2.bucket_sec = d1.bucket_sec + g.lag * 3600
           |  GROUP BY 1, 2)
           |SELECT nm.event_type, CAST(lag AS BIGINT) AS lag, n_terms,
           |  round(CAST(num AS DOUBLE) / nullif(den, 0), 6) AS acf
           |FROM nm JOIN dn USING (event_type)
           |ORDER BY event_type, lag""".stripMargin,

      "ts_theilsen" ->
        s"""WITH $duckHourlyCounts,
           |pr AS (SELECT h1.event_type,
           |    (h2.n - h1.n) * 1000000 // g.lag AS slope_micro
           |  FROM hc h1
           |  CROSS JOIN (SELECT unnest(generate_series(1, $TheilSenMaxLag))
           |    AS lag) g
           |  JOIN hc h2 ON h2.event_type = h1.event_type
           |    AND h2.bucket_sec = h1.bucket_sec + g.lag * 3600)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           |  round(quantile_cont(slope_micro, 0.5), 6) AS median_slope_micro
           |FROM pr GROUP BY event_type ORDER BY event_type""".stripMargin,

      // NOTE: replayed as a recursive CTE over (l, b) columns, NOT a
      // list_reduce with a struct accumulator — DuckDB v1.0 evaluates a
      // repeated subexpression across struct fields of a list_reduce
      // lambda against inconsistent accumulator state (probe: fold of
      // {'l': E//2, 'b': E//2 + 1000} returns b != l + 1000).
      "ts_holtwinters" ->
        s"""WITH RECURSIVE $duckHourlyCounts,
           |idx AS (SELECT event_type, n * $HwMicro AS y,
           |    row_number() OVER (PARTITION BY event_type ORDER BY bucket_sec)
           |      AS i,
           |    count(*) OVER (PARTITION BY event_type) AS h
           |  FROM hc),
           |rec(event_type, h, j, l, b) AS (
           |  SELECT i1.event_type, i1.h, 1, i1.y, i2.y - i1.y
           |  FROM idx i1 JOIN idx i2
           |    ON i2.event_type = i1.event_type AND i2.i = 2
           |  WHERE i1.i = 1 AND i1.h >= 2
           |  UNION ALL
           |  SELECT r.event_type, r.h, r.j + 1,
           |    (2 * x.y + 8 * (r.l + r.b)) // 10,
           |    ((2 * x.y + 8 * (r.l + r.b)) // 10 - r.l + 9 * r.b) // 10
           |  FROM rec r JOIN idx x
           |    ON x.event_type = r.event_type AND x.i = r.j + 1)
           |SELECT event_type, CAST(h AS BIGINT) AS n_hours,
           |  CAST(l AS BIGINT) AS level_micro, CAST(b AS BIGINT) AS trend_micro,
           |  CAST(l + b AS BIGINT) AS fc1_micro,
           |  CAST(l + 2 * b AS BIGINT) AS fc2_micro,
           |  CAST(l + 3 * b AS BIGINT) AS fc3_micro
           |FROM rec WHERE j = h ORDER BY event_type""".stripMargin,

      "resample_gapfill_1h" ->
        s"""WITH b AS (
          |  SELECT event_type, (epoch_ms(ts) // 3600000) * 3600 AS bucket_sec,
          |    count(*) AS n_events, ${graft.ops.Metrics.meanExact2dpSql("value")} AS avg_value
          |  FROM events GROUP BY 1, 2),
          |g AS (
          |  SELECT event_type, unnest(generate_series(min(bucket_sec), max(bucket_sec), 3600))
          |    AS bucket_sec
          |  FROM b GROUP BY event_type),
          |j AS (
          |  SELECT g.event_type, g.bucket_sec,
          |    coalesce(b.n_events, 0) AS n_events, b.avg_value
          |  FROM g LEFT JOIN b USING (event_type, bucket_sec))
          |SELECT event_type, bucket_sec, n_events, avg_value,
          |  last_value(avg_value IGNORE NULLS) OVER (PARTITION BY event_type
          |    ORDER BY bucket_sec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |    AS value_locf
          |FROM j ORDER BY event_type, bucket_sec""".stripMargin,

      // Deliberately the DIRECT single-level aggregate: hash-equality with
      // the engine's two-level day-partial merge IS the incremental-rollup
      // correctness proof.
      "incremental_two_level_agg" ->
        """SELECT event_type, count(*) AS n_events,
          |  round(sum(value), 2) AS sum_value,
          |  round(min(value), 2) AS min_value,
          |  round(max(value), 2) AS max_value
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "ts_similarity_types" ->
        """WITH b AS (SELECT event_type, epoch_ms(ts) // 3600000 AS bucket,
          |             count(*) AS n
          |           FROM events GROUP BY 1, 2)
          |SELECT a.event_type AS type_a, c.event_type AS type_b,
          |  round(corr(a.n, c.n), 6) + 0.0 AS corr_n, count(*) AS n_buckets
          |FROM b a JOIN b c ON a.bucket = c.bucket AND a.event_type < c.event_type
          |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin,

      "dq_profile" -> {
        val branches = profileCols.map(c =>
          s"SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull, " +
            s"count(DISTINCT $c) AS n_distinct FROM events").mkString("\nUNION ALL\n")
        s"$branches\nORDER BY col_name"
      })
  }
}
