package graft.model

import org.apache.spark.sql.types._

/** The reference's wire-format event (producer/producer.py:38-45; declared
  * StructType at spark_job/spark_stream_metrics.py:7-14). All fields
  * nullable, schema fixed/declared — malformed JSON yields a NULL struct
  * under `from_json`'s PERMISSIVE default.
  */
case class Event(
    event_id: String,
    created_ts: java.lang.Long,
    user_id: java.lang.Integer,
    event_type: String,
    value: java.lang.Double,
    payload: String)

object Event {
  /** Mirrors spark_job/spark_stream_metrics.py:7-14 field-for-field. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = true),
    StructField("created_ts", LongType, nullable = true),
    StructField("user_id", IntegerType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("payload", StringType, nullable = true)))

  /** The four event types the producer round-robins through
    * (producer.py:42).
    */
  val types: Seq[String] = Seq("click", "view", "purchase", "login")
}

/** Per-micro-batch metrics row (DDL at spark_job/spark_stream_metrics.py:67,
  * written :71-74) — the schema of every offline-analysis input.
  */
case class BatchMetrics(
    batch_id: Long,
    epoch_sec: Long,
    batch_events: Long,
    mean_latency_ms: Double,
    p50_latency_ms: Double,
    p95_latency_ms: Double,
    p99_latency_ms: Double)

object BatchMetrics {
  val ddl: String =
    "batch_id long, epoch_sec long, batch_events long, mean_latency_ms double, " +
      "p50_latency_ms double, p95_latency_ms double, p99_latency_ms double"
  val schema: StructType = StructType.fromDDL(ddl)
}
