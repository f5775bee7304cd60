package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.Metrics
import graft.analysis.Analysis

/** Reference-parity operators (SURVEY §2) over the `events` fixture table:
  * latency derivation, single-pass batch metrics, throughput, warm-up
  * windows, lag-gap recovery analysis, per-run summaries.
  */
object ParityQueries extends QueryPack {

  /** Fixed "now" for deterministic latency math (2024-02-01 00:00:00 UTC,
    * just past the events table's max ts) — SURVEY §7.4.1.
    */
  val NowMs: Long = 1706745600000L

  /** Emulated micro-batch width for batch-replay of the streaming pipeline:
    * 1 h buckets give realistically-sized batches on the month-long fixture
    * stream (the reference's real trigger is 5 s; the width is a
    * parameter, semantics identical).
    */
  val TriggerSec: Int = 3600

  private val WarmupSec  = 86400L  // analog of the reference's 120 s warm-up
  private val MeasureSec = 604800L // analog of the 240 s measurement window

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P3: per-event latency derivation (deterministic injected now).
    "p3_latency" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"), (lit(NowMs) - tsMillis(col("ts"))).as("latency_ms"))
        .orderBy("event_id")),

    // A1+A2+A3+A6+P8: the whole per-batch metrics record in ONE aggregation
    // pass (empty-guard folds into count; SURVEY §4.3).
    "a6_batch_metrics" -> ((s, d) =>
      Metrics.batchMetrics(events(s, d), col("ts"), NowMs)),

    // The streaming pipeline replayed over event-time micro-batches.
    "batch_metrics_bucketed" -> ((s, d) =>
      Metrics.bucketedMetrics(events(s, d), col("ts"), NowMs, TriggerSec)
        .orderBy("batch_epoch_sec")),

    // P6: throughput derivation from batch counts.
    "p6_throughput" -> ((s, d) =>
      Metrics.bucketedMetrics(events(s, d), col("ts"), NowMs, TriggerSec)
        .select(col("batch_epoch_sec"),
          round(col("batch_events") / lit(TriggerSec.toDouble), 6).as("throughput_eps"))
        .orderBy("batch_epoch_sec")),

    // P7: warm-up/measurement window filter anchored on the global min —
    // the anchor is a broadcast 1-row aggregate, not a driver collect.
    "p7_window_filter" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_ms", tsMillis(col("ts")))
      val anchor = ev.agg(min(col("ts_ms")).as("t0_ms"))
      ev.crossJoin(broadcast(anchor))
        .where(col("ts_ms") >= col("t0_ms") + lit(WarmupSec * 1000) &&
               col("ts_ms") <  col("t0_ms") + lit((WarmupSec + MeasureSec) * 1000))
        .select(col("event_id"))
        .orderBy("event_id")
    }),

    // P9: regex extraction (run-label analog: pull the numeric k out of the
    // JSON props string).
    "p9_regex_extract" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int").as("k"))
        .orderBy("event_id")),

    // W1: global sort by event time (tiebreak on id for total order).
    "w1_sort_by_time" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"), tsMillis(col("ts")).as("ts_ms"))
        .orderBy(col("ts_ms"), col("event_id"))),

    // W3: lag-gap between consecutive events (the reference's one window
    // function, analyze_recovery.py:15) — banded implementation: no global
    // window touches the event table (ops/TimeSeries.lagOverTime).
    "w3_lag_gap" -> ((s, d) =>
      graft.ops.TimeSeries.gapToPrev(
          events(s, d).select(col("event_id"), tsMillis(col("ts")).as("ts_ms")),
          col("ts_ms"), col("event_id"), width = 3600L * 1000)
        .select(col("event_id"), col("gap_ms"))
        .orderBy("event_id")),

    // A7/W4: argmax row — largest inter-batch gap = the recovery event.
    "exp3_recovery" -> ((s, d) => {
      val m = Metrics.bucketedMetrics(events(s, d), col("ts"), NowMs, TriggerSec)
        .withColumn("batch_id", (col("batch_epoch_sec") / TriggerSec).cast("long"))
      val w = Window.orderBy(col("batch_epoch_sec"))
      m.withColumn("gap_sec", col("batch_epoch_sec") - lag(col("batch_epoch_sec"), 1).over(w))
        .where(col("gap_sec").isNotNull)
        .select(col("batch_id"), col("batch_epoch_sec"), col("gap_sec"), col("p95_latency_ms_x100"))
        .orderBy(col("gap_sec").desc, col("batch_epoch_sec"))
        .limit(1)
    }),

    // A4/A5 + P5-P7 composite: the full exp1 offline analysis — per-run
    // (event_type) windowed summary over the emulated metrics table.
    // Integer-exact flavor of Analysis.summarize (which mirrors the pandas
    // double math for the product path): every compared column is a long
    // (sums + `div`), so summation order can't move a hash.
    "exp1_summary" -> ((s, d) => {
      val lat = Metrics.withLatency(events(s, d), col("ts"), Some(NowMs))
      val m = lat
        .groupBy(col("event_type").as("run_label"),
          (floor(tsMillis(col("ts")) / (TriggerSec * 1000L)) * TriggerSec).as("epoch_sec"))
        .agg(Metrics.metricAggsExact(col("latency_ms")).head,
          Metrics.metricAggsExact(col("latency_ms")).tail: _*)
        .select(col("run_label") +: col("epoch_sec") +: Metrics.derivedMetrics: _*)
      Analysis.measurementWindow(m, "run_label", WarmupSec, MeasureSec)
        .groupBy(col("run_label"))
        .agg(
          count(lit(1)).as("n_batches"),
          sum(col("batch_events")).as("_ev_sum"),
          round(percentile(col("batch_events"), lit(0.95)) * 100, 0).cast("long")
            .as("p95_batch_events_x100"),
          sum(col("mean_latency_us")).as("_mlu_sum"),
          sum(col("p50_latency_ms_x100")).as("_p50_sum"),
          sum(col("p95_latency_ms_x100")).as("_p95_sum"),
          sum(col("p99_latency_ms_x100")).as("_p99_sum"),
          max(col("p95_latency_ms_x100")).as("max_p95_latency_ms_x100"))
        .select(col("run_label"), col("n_batches"),
          expr(s"_ev_sum * 1000000 div (n_batches * $TriggerSec)").as("mean_throughput_eps_x1e6"),
          col("p95_batch_events_x100"),
          expr("_mlu_sum div n_batches").as("mean_latency_us"),
          expr("_p50_sum div n_batches").as("mean_p50_latency_ms_x100"),
          expr("_p95_sum div n_batches").as("mean_p95_latency_ms_x100"),
          expr("_p99_sum div n_batches").as("mean_p99_latency_ms_x100"),
          col("max_p95_latency_ms_x100"))
        .orderBy("run_label")
    }),

    // A4 (direct): grouped summary statistics by event type.
    "a4_summary_by_type" -> ((s, d) =>
      events(s, d).groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          graft.ops.Metrics.meanExact2dp(col("value")).as("mean_value"),
          round(percentile(col("value"), lit(0.95)), 6).as("p95_value"),
          round(max(col("value")), 6).as("max_value"),
          round(min(col("value")), 6).as("min_value"))
        .orderBy("event_type")))

  def oracleSql: Map[String, String] = {
    val lat = s"($NowMs - epoch_ms(ts))"
    val bucket = s"(epoch_ms(ts) // ${TriggerSec}000) * $TriggerSec"
    // Per-bucket metrics subquery shared by several oracles (mirrors
    // Metrics.bucketedMetrics + metricAggsExact: integer-exact columns —
    // long sums with `//`, percentiles snapped to x100 integers; see
    // Metrics.metricAggsExact scaladoc for why doubles can't be hashed at
    // this magnitude).
    val metricCols =
      s"""count(*) AS batch_events,
         |  CAST(sum($lat) * 1000 // count(*) AS BIGINT) AS mean_latency_us,
         |  CAST(round(quantile_cont($lat, 0.50) * 100, 0) AS BIGINT) AS p50_latency_ms_x100,
         |  CAST(round(quantile_cont($lat, 0.95) * 100, 0) AS BIGINT) AS p95_latency_ms_x100,
         |  CAST(round(quantile_cont($lat, 0.99) * 100, 0) AS BIGINT) AS p99_latency_ms_x100""".stripMargin
    val bucketedMetrics =
      s"""SELECT $bucket AS batch_epoch_sec, $metricCols
         |FROM events GROUP BY 1""".stripMargin

    Map(
      "p3_latency" ->
        s"SELECT event_id, $lat AS latency_ms FROM events ORDER BY event_id",

      "a6_batch_metrics" ->
        s"SELECT $metricCols\nFROM events",

      "batch_metrics_bucketed" ->
        s"SELECT * FROM ($bucketedMetrics) ORDER BY batch_epoch_sec",

      "p6_throughput" ->
        s"""SELECT batch_epoch_sec, round(batch_events / $TriggerSec.0, 6) AS throughput_eps
           |FROM ($bucketedMetrics) ORDER BY batch_epoch_sec""".stripMargin,

      "p7_window_filter" ->
        s"""SELECT event_id FROM events
           |WHERE epoch_ms(ts) >= (SELECT min(epoch_ms(ts)) FROM events) + ${WarmupSec * 1000}
           |  AND epoch_ms(ts) <  (SELECT min(epoch_ms(ts)) FROM events) + ${(WarmupSec + MeasureSec) * 1000}
           |ORDER BY event_id""".stripMargin,

      "p9_regex_extract" ->
        """SELECT event_id, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k
          |FROM events ORDER BY event_id""".stripMargin,

      "w1_sort_by_time" ->
        "SELECT event_id, epoch_ms(ts) AS ts_ms FROM events ORDER BY ts_ms, event_id",

      "w3_lag_gap" ->
        """SELECT event_id, ts_ms - lag(ts_ms, 1) OVER (ORDER BY ts_ms, event_id) AS gap_ms
          |FROM (SELECT event_id, epoch_ms(ts) AS ts_ms FROM events)
          |ORDER BY event_id""".stripMargin,

      "exp3_recovery" ->
        s"""SELECT CAST(batch_epoch_sec / $TriggerSec AS BIGINT) AS batch_id, batch_epoch_sec,
           |  batch_epoch_sec - lag(batch_epoch_sec, 1) OVER (ORDER BY batch_epoch_sec) AS gap_sec,
           |  p95_latency_ms_x100
           |FROM ($bucketedMetrics)
           |QUALIFY gap_sec IS NOT NULL
           |ORDER BY gap_sec DESC, batch_epoch_sec LIMIT 1""".stripMargin,

      "exp1_summary" ->
        s"""WITH m AS (
           |  SELECT event_type AS run_label, $bucket AS epoch_sec, $metricCols
           |  FROM events GROUP BY 1, 2),
           |w AS (
           |  SELECT *, min(epoch_sec) OVER (PARTITION BY run_label) + $WarmupSec AS t0
           |  FROM m),
           |f AS (
           |  SELECT *,
           |    (epoch_sec >= t0 AND epoch_sec < t0 + $MeasureSec) AS in_strict,
           |    sum(CASE WHEN epoch_sec >= t0 AND epoch_sec < t0 + $MeasureSec THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY run_label) AS strict_n
           |  FROM w),
           |g AS (SELECT * FROM f
           |      WHERE CASE WHEN strict_n >= 5 THEN in_strict ELSE epoch_sec >= t0 END)
           |SELECT run_label, count(*) AS n_batches,
           |  CAST(sum(batch_events) * 1000000 // (count(*) * $TriggerSec) AS BIGINT)
           |    AS mean_throughput_eps_x1e6,
           |  CAST(round(quantile_cont(batch_events, 0.95) * 100, 0) AS BIGINT)
           |    AS p95_batch_events_x100,
           |  CAST(sum(mean_latency_us) // count(*) AS BIGINT) AS mean_latency_us,
           |  CAST(sum(p50_latency_ms_x100) // count(*) AS BIGINT) AS mean_p50_latency_ms_x100,
           |  CAST(sum(p95_latency_ms_x100) // count(*) AS BIGINT) AS mean_p95_latency_ms_x100,
           |  CAST(sum(p99_latency_ms_x100) // count(*) AS BIGINT) AS mean_p99_latency_ms_x100,
           |  max(p95_latency_ms_x100) AS max_p95_latency_ms_x100
           |FROM g GROUP BY run_label ORDER BY run_label""".stripMargin,

      "a4_summary_by_type" ->
        s"""SELECT event_type, count(*) AS n,
          |  ${graft.ops.Metrics.meanExact2dpSql("value")} AS mean_value,
          |  round(quantile_cont(value, 0.95), 6) AS p95_value,
          |  round(max(value), 6) AS max_value,
          |  round(min(value), 6) AS min_value
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
  }
}
