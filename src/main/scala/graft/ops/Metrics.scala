package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables.tsMillis

/** Latency + per-batch metric computation — the reference's core semantics
  * (spark_job/spark_stream_metrics.py:49-68) re-expressed as a SINGLE
  * aggregation pass.
  *
  * The reference runs 4 separate Spark jobs per micro-batch
  * (`rdd.isEmpty()` :56, `count()` :59, `approxQuantile` :61, `agg(avg)`
  * :62), re-reading the batch each time. Here the count doubles as the
  * empty-batch guard and the quantile sketch is an expression composed into
  * the same `agg` — one scan, partial aggregation map-side, one shuffle of
  * sketch-sized state. That shape holds at any scale: the reduced state per
  * partition is O(sketch), never O(rows).
  */
object Metrics {

  /** latency_ms = now - created_ts (reference formula
    * spark_job/spark_stream_metrics.py:49-52).
    *
    * `nowMs = None` reproduces the reference's processing-time proxy
    * including its second-granularity quantization
    * (`unix_timestamp(current_timestamp()) * 1000`); a fixed `nowMs` makes
    * the metric deterministic for oracle comparison (SURVEY §7.4.1).
    */
  def withLatency(df: DataFrame, tsCol: Column, nowMs: Option[Long]): DataFrame = {
    val now = nowMs.map(lit(_)).getOrElse(unix_timestamp(current_timestamp()) * 1000L)
    df.withColumn("latency_ms", (now - tsMillis(tsCol)).cast("long"))
  }

  /** The five metric aggregates of a batch, exact-percentile flavor
    * (oracle-comparable: Spark `percentile` and DuckDB `quantile_cont` are
    * both linear-interpolation). One pass; doubles rounded to 6 so
    * last-ulp summation-order differences can't break hash compares.
    */
  def metricAggsExact(lat: Column): Seq[Column] = Seq(
    count(lit(1)).as("batch_events"),
    round(avg(lat), 6).as("mean_latency_ms"),
    round(percentile(lat, lit(0.50)), 6).as("p50_latency_ms"),
    round(percentile(lat, lit(0.95)), 6).as("p95_latency_ms"),
    round(percentile(lat, lit(0.99)), 6).as("p99_latency_ms"))

  /** Production flavor: Greenwald-Khanna sketch (`percentile_approx`),
    * mergeable and O(1/accuracy) state per partition — the right choice on
    * a large cluster where exact percentile would sort each group.
    * accuracy=100 ≈ the reference's relativeError=0.01
    * (spark_stream_metrics.py:61; accuracy = 1/relativeError).
    */
  def metricAggsApprox(lat: Column, accuracy: Int = 100): Seq[Column] = Seq(
    count(lit(1)).as("batch_events"),
    avg(lat).as("mean_latency_ms"),
    // cast: percentile_approx of an integral column yields integral values
    element_at(percentile_approx(lat, array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)), 1)
      .cast("double").as("p50_latency_ms"),
    element_at(percentile_approx(lat, array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)), 2)
      .cast("double").as("p95_latency_ms"),
    element_at(percentile_approx(lat, array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)), 3)
      .cast("double").as("p99_latency_ms"))

  /** Global single-pass metrics record over an event frame — the A6
    * composite (spark_stream_metrics.py:59-68) as one job.
    */
  def batchMetrics(events: DataFrame, tsCol: Column, nowMs: Long): DataFrame =
    withLatency(events, tsCol, Some(nowMs))
      .agg(metricAggsExact(col("latency_ms")).head, metricAggsExact(col("latency_ms")).tail: _*)

  /** Batch-replay of the streaming pipeline: bucket events into
    * trigger-sized micro-batches by event time and compute the per-batch
    * metrics table (batch_epoch_sec plays batch_id/epoch_sec). Partial
    * aggregation keeps the shuffle at one row per (bucket) — at 100 TB the
    * shuffle key count is bounded by time-range/trigger, not row count.
    */
  def bucketedMetrics(events: DataFrame, tsCol: Column, nowMs: Long,
      triggerSec: Int = 5): DataFrame = {
    val bucket = (floor(tsMillis(tsCol) / (triggerSec * 1000L)) * triggerSec).as("batch_epoch_sec")
    withLatency(events, tsCol, Some(nowMs))
      .groupBy(bucket)
      .agg(metricAggsExact(col("latency_ms")).head, metricAggsExact(col("latency_ms")).tail: _*)
  }
}
