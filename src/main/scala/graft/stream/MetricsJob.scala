package graft.stream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.Event
import graft.ops.Metrics

/** The reference's flagship streaming job re-expressed Spark-first in
  * Scala: Kafka (or any value-column stream) → JSON parse → latency
  * derivation → per-micro-batch metrics → CSV append + console, with
  * checkpointing (spark_job/spark_stream_metrics.py:16-86).
  *
  * Differences from the reference, by design (SURVEY §4.3): the four
  * separate per-batch actions (`rdd.isEmpty`, `count`, `approxQuantile`,
  * `agg(avg)`) collapse into ONE aggregation job per batch — count doubles
  * as the empty-batch guard and the Greenwald-Khanna sketch rides in the
  * same `agg`. Output stays at-least-once (non-transactional CSV append),
  * exactly like the reference (SURVEY §7.4.3).
  */
object MetricsJob {

  /** Parse stage (P1+P2): binary/string `value` column → typed event
    * columns. Works unchanged on a Kafka frame (binary value + metadata
    * cols) and on a MemoryStream[String] test frame.
    */
  def parse(raw: DataFrame): DataFrame =
    raw.selectExpr("CAST(value AS STRING) AS value_str")
      .select(from_json(col("value_str"), Event.schema).as("e"))
      .select("e.*")

  /** Latency stage (P3): the reference's processing-time proxy with its
    * second-granularity quantization, or a fixed clock for deterministic
    * tests.
    */
  def withLatency(parsed: DataFrame, nowMs: Option[Long] = None): DataFrame = {
    val now = nowMs.map(lit(_)).getOrElse(unix_timestamp(current_timestamp()) * 1000L)
    parsed.withColumn("latency_ms", (now - col("created_ts")).cast("long"))
  }

  /** Single-pass per-batch metrics (A6): returns None for an empty batch
    * (P8's guard, folded into the same job). accuracy=100 matches the
    * reference's relativeError=0.01.
    */
  def batchMetricsRow(batchDf: DataFrame): Option[Row] = {
    val aggs = Metrics.metricAggsApprox(col("latency_ms"))
    val row = batchDf.agg(aggs.head, aggs.tail: _*).head()
    if (row.getLong(0) == 0L) None else Some(row)
  }

  /** The foreachBatch sink body (T2+S3): metrics row → 1-row DataFrame →
    * single-file CSV append under `outDir` + console progress line.
    */
  def writeBatch(spark: SparkSession, outDir: String)(batchDf: DataFrame, batchId: Long): Unit =
    batchMetricsRow(batchDf).foreach { r =>
      import spark.implicits._
      val epochSec = System.currentTimeMillis() / 1000L
      val out = Seq((batchId, epochSec, r.getLong(0),
        Option(r.get(1)).fold(Double.NaN)(_ => r.getDouble(1)),
        Option(r.get(2)).fold(Double.NaN)(_ => r.getDouble(2)),
        Option(r.get(3)).fold(Double.NaN)(_ => r.getDouble(3)),
        Option(r.get(4)).fold(Double.NaN)(_ => r.getDouble(4))))
        .toDF("batch_id", "epoch_sec", "batch_events", "mean_latency_ms",
          "p50_latency_ms", "p95_latency_ms", "p99_latency_ms")
      out.coalesce(1).write.mode("append").option("header", "true").csv(outDir)
      // Console progress (S7) — one line per batch, like the reference's print.
      println(s"[metrics] batch=$batchId events=${r.getLong(0)} mean=${r.get(1)} " +
        s"p50=${r.get(2)} p95=${r.get(3)} p99=${r.get(4)}")
    }

  /** Kafka source (S1) — identical options to the reference. Not runnable
    * in the offline harness (no broker); the parse→metrics path is shared
    * with the MemoryStream tests, so this is config glue only.
    */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** Idempotent variant of the metrics sink: each batch writes
    * `outDir/batch_id=N/` with overwrite, so a batch re-processed after
    * checkpoint recovery replaces its own output instead of appending a
    * duplicate — upgrading the reference's at-least-once CSV semantics
    * (SURVEY §7.4.3) to effectively-once. Readers get `batch_id` back via
    * partition discovery.
    */
  def writeBatchIdempotent(spark: SparkSession, outDir: String)(
      batchDf: DataFrame, batchId: Long): Unit =
    batchMetricsRow(batchDf).foreach { r =>
      import spark.implicits._
      val epochSec = System.currentTimeMillis() / 1000L
      Seq((epochSec, r.getLong(0),
        Option(r.get(1)).fold(Double.NaN)(_ => r.getDouble(1)),
        Option(r.get(2)).fold(Double.NaN)(_ => r.getDouble(2)),
        Option(r.get(3)).fold(Double.NaN)(_ => r.getDouble(3)),
        Option(r.get(4)).fold(Double.NaN)(_ => r.getDouble(4))))
        .toDF("epoch_sec", "batch_events", "mean_latency_ms",
          "p50_latency_ms", "p95_latency_ms", "p99_latency_ms")
        .coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/batch_id=$batchId")
    }

  /** Kafka producer sink (S2): JSON-serialized frame → topic. Batch
    * flavor; `ds.writeStream.format("kafka")` is the streaming twin. Like
    * the source, config glue only in the offline harness (no broker).
    */
  def publishKafka(jsonValueDf: DataFrame, bootstrap: String, topic: String): Unit =
    jsonValueDf
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()

  /** Wire any value-column streaming frame through the full pipeline
    * (T1-T5): parse → latency → foreachBatch metrics/CSV, with checkpoint
    * and processing-time trigger. `idempotentSink=false` (default) is the
    * reference's at-least-once CSV append; `true` swaps in
    * [[writeBatchIdempotent]] for effectively-once output across
    * checkpoint recovery (a replayed batch overwrites its own
    * `batch_id=N/` directory instead of appending a duplicate row).
    */
  def start(spark: SparkSession, raw: DataFrame, outDir: String,
      checkpointDir: String, triggerSec: Int = 5,
      nowMs: Option[Long] = None,
      idempotentSink: Boolean = false): StreamingQuery =
    startWith(spark, raw, checkpointDir, triggerSec, nowMs,
      if (idempotentSink) writeBatchIdempotent(spark, outDir)
      else writeBatch(spark, outDir))

  /** [[start]] with a caller-chosen foreachBatch sink (e.g.
    * [[writeBatchIdempotent]] for effectively-once recovery benchmarks).
    */
  def startWith(spark: SparkSession, raw: DataFrame, checkpointDir: String,
      triggerSec: Int, nowMs: Option[Long],
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    withLatency(parse(raw), nowMs)
      .writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$triggerSec seconds"))
      .start()

  /** Stream-static enrichment join: the streaming frame joins a static
    * dimension (e.g. a user/account table) — Spark re-plans the static
    * side per micro-batch, broadcasting it when small. The standard
    * "enrich events before aggregation" shape.
    */
  def enrich(parsed: DataFrame, dim: DataFrame, key: String): DataFrame =
    parsed.join(dim, Seq(key), "left")

  /** Streaming deduplication bounded by watermark: duplicates of the same
    * event id arriving within the watermark horizon are dropped; state is
    * purged as the watermark advances, so it stays bounded on an unbounded
    * stream. Pipeline-schema spelling of [[DedupStream.withinWatermark]]
    * (eviction/re-admission semantics proven in DedupStreamSpec).
    */
  def dedupEvents(parsed: DataFrame, watermark: String = "10 minutes"): DataFrame =
    DedupStream.withinWatermark(
      parsed.withColumn("event_time", timestamp_millis(col("created_ts"))),
      Seq("event_id"), "event_time", watermark)

  /** Stream-stream interval join — the remaining §2.6 "absent feature":
    * correlate two event streams on a key within a bounded event-time
    * interval (right event in `[left_time, left_time + windowSec]`).
    * BOTH sides are watermarked and the join condition bounds their
    * event-time distance — the only shape under which Spark can purge
    * join state as watermarks advance; an unbounded-condition
    * stream-stream join would grow state forever. Column names are
    * prefixed per side so the join output is unambiguous.
    *
    * `joinType` admits the outer flavors ("leftOuter", "rightOuter",
    * "fullOuter"): an unmatched row is emitted null-extended once the
    * watermark passes its join window (i.e. once a match has become
    * impossible) — the outer result stays append-only and state stays
    * purgeable.
    */
  def correlate(left: DataFrame, right: DataFrame, key: String,
      watermark: String = "10 minutes", windowSec: Long = 300L,
      joinType: String = "inner"): DataFrame = {
    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")): _*)
      .withColumn("l_time", timestamp_millis(col(s"l_created_ts")))
      .withWatermark("l_time", watermark)
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("r_time", timestamp_millis(col(s"r_created_ts")))
      .withWatermark("r_time", watermark)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col("r_time") >= col("l_time") &&
        col("r_time") <= col("l_time") + expr(s"INTERVAL $windowSec SECONDS"),
      joinType)
  }

  /** Event-time windowed aggregation with watermark — the streaming
    * extension beyond reference parity (SURVEY §2.6 "absent features"):
    * tumbling windows over `created_ts`, late data bounded by the
    * watermark, partial aggregation before the stateful shuffle.
    */
  def windowedCounts(parsed: DataFrame, windowDur: String = "1 minute",
      watermark: String = "2 minutes", slide: Option[String] = None): DataFrame =
    parsed
      .withColumn("event_time", timestamp_millis(col("created_ts")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur, slide.getOrElse(windowDur)),
        col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("mean_value"))

  /** Windowed distinct users via a streaming HLL sketch aggregation — the
    * ingest-time spelling of `ext/Sketches`: per-window state is the
    * KB-sized sketch (not the user-id set, which is what a streaming
    * `count(DISTINCT)` would have to hold), and the emitted row carries
    * BOTH the estimate and the sketch bytes, so closed windows remain
    * mergeable downstream (any coarser rollup = `hll_union_agg` over
    * emitted rows, raw events never re-scanned — `Sketches.rollup`).
    * Estimate accuracy: HLL rse ≈ 1.6% at the default lgK; exact below
    * sketch capacity (pinned in StreamingSpec against the batch twin).
    */
  def windowedDistinctUsers(parsed: DataFrame, windowDur: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    parsed
      .withColumn("event_time", timestamp_millis(col("created_ts")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"))
      .select(col("window"),
        hll_sketch_estimate(col("user_sketch")).as("n_users_est"),
        col("user_sketch"))

  /** Built-in streaming session windows: per-user sessions merged under an
    * inactivity gap by the native `session_window` aggregation (state is
    * one entry per OPEN session; append mode emits a session only when the
    * watermark proves it closed, which is what makes state purgeable on an
    * unbounded stream). The batch/oracle twin is `session_window_native`;
    * `stream/Sessionize` holds the arbitrary-state implementations of the
    * same semantics.
    */
  def sessionCounts(parsed: DataFrame, gap: String = "30 seconds",
      watermark: String = "1 minute"): DataFrame =
    parsed
      .withColumn("event_time", timestamp_millis(col("created_ts")))
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Streaming windowed count-min: per-window point-frequency state as a
    * KB-sized CMS counter matrix instead of a per-key count map — the
    * "how often did key X occur this window?" twin of
    * [[windowedDistinctUsers]]'s HLL. Emitted rows carry the sketch
    * BYTES, so closed windows stay mergeable downstream
    * (`Sketches.cmsMergeEstimate` over any range of emitted rows answers
    * point queries for that range — raw events never re-scanned), plus a
    * total-count column for normalization. Same eps/confidence/seed as
    * the batch path so partials from both merge. Estimates only ever
    * over-count (eps·N bound); exact while the window's distinct keys
    * stay far below the counter width — pinned in StreamingSpec against
    * the exact per-window counts.
    */
  def windowedKeyFreq(parsed: DataFrame, keyCol: String,
      windowDur: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    parsed
      .withColumn("event_time", timestamp_millis(col("created_ts")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur))
      .agg(
        call_function("count_min_sketch", col(keyCol),
          lit(0.001), lit(0.99), lit(42)).as("freq_sketch"),
        count(lit(1)).as("n_total"))

  /** Streaming windowed latency QUANTILES via a KLL sketch aggregation —
    * the quantile member of the per-window sketch family
    * ([[windowedDistinctUsers]] = distinct/HLL, [[windowedKeyFreq]] =
    * frequency/CMS): per-window state is the KB-sized KLL sketch, never
    * the full value buffer an exact streaming percentile would pin in
    * state. Emitted rows read p50/p95/p99 AND carry the sketch bytes, so
    * closed windows re-merge to ANY coarser rollup —
    * `Sketches.kllRollup` over a range of emitted rows answers that
    * range's quantiles with raw events never re-scanned. Same k as the
    * batch path (`Sketches.kllSketches`), so streaming partials and
    * batch partials merge freely; KLL is exact while a window's count
    * stays under the sketch buffer, rank error ~1.65/sqrt(k) beyond
    * (pinned in StreamingSpec against the batch twin).
    */
  def windowedLatencyQuantiles(withLat: DataFrame, valCol: String = "latency_ms",
      windowDur: String = "1 minute", watermark: String = "2 minutes",
      k: Int = 200): DataFrame = {
    def q(p: Double) =
      call_function("kll_sketch_get_quantile_double", col("lat_sketch"), lit(p))
    withLat
      .withColumn("event_time", timestamp_millis(col("created_ts")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur))
      .agg(
        call_function("kll_sketch_agg_double",
          col(valCol).cast("double"), lit(k)).as("lat_sketch"),
        count(lit(1)).as("n_total"))
      .select(col("window"), col("n_total"),
        q(0.5).as("p50"), q(0.95).as("p95"), q(0.99).as("p99"),
        col("lat_sketch"))
  }
}
