package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.model.Event

/** DataSourceV2 implementation of the reference producer's synthetic event
  * feed (producer/producer.py:31-54) — the last rung of the engine's
  * Spark-extension ladder (native Expression → optimizer Rule → physical
  * operator → connector).
  *
  * `spark.read.format("graft-events")` (batch) and
  * `spark.readStream.format("graft-events")` (micro-batch) produce the
  * producer's exact event schema and derivation rules (user_id/event_type/
  * value cycles, absolute-schedule pacing `created_ts = start + i/rate`),
  * generated deterministically per row index — so the batch source is
  * bit-identical to `gen/EventGen.events` and the stream replays the same
  * rows the Kafka producer would have sent.
  *
  * Options: `numRows` (batch size), `rateEps` (events/sec — drives both
  * the pacing timestamps and the micro-batch offset clock), `startMs`,
  * `sizeBytes` (payload padding), `numPartitions`.
  *
  * Scale shape: rows are generated partition-parallel from index ranges
  * (no driver loop, no shuffle); a 100 TB backfill is just `numRows`
  * ranges split across executors.
  */
class EventsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventsTable(EventsConfig(new CaseInsensitiveStringMap(properties)))
}

object EventsSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("created_ts", LongType, nullable = false),
    StructField("user_id", IntegerType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Row `i` of the feed — the producer's derivation rules, shared by the
    * batch and streaming paths (and mirrored by gen/EventGen).
    */
  def row(i: Long, cfg: EventsConfig): InternalRow = {
    val values = new Array[Any](6)
    values(0) = UTF8String.fromString(f"evt-$i%012d")
    values(1) = cfg.startMs + (i * 1000.0 / cfg.rateEps).toLong
    values(2) = (i % 10000).toInt
    values(3) = UTF8String.fromString(Event.types((i % Event.types.size).toInt))
    values(4) = (i % 1000) / 10.0
    values(5) = UTF8String.fromString(cfg.filler)
    new GenericInternalRow(values)
  }
}

case class EventsConfig(numRows: Long, rateEps: Double, startMs: Long,
    sizeBytes: Int, numPartitions: Int, backlogRows: Long = 0L,
    maxRowsPerTrigger: Long = -1L, clockKey: String = "") {
  val filler: String = "x" * math.max(0, sizeBytes - 120)
  /** Pacing clock: wall time in production; a registered manual clock in
    * tests (`clockKey` option). Only the driver-side offset bookkeeping
    * reads it, so a same-JVM registry is correct even on a cluster.
    */
  def nowMs(): Long =
    if (clockKey.isEmpty) System.currentTimeMillis()
    else EventsClock.nowMs(clockKey)
}

/** Test seam for the pacing clock. `latestOffset`/`initialOffset` run on
  * the driver, so tests can register a deterministic clock under a key and
  * pass it via the `clockKey` read option — timing assertions then depend
  * on controlled advances, not wall-clock races under suite load.
  */
object EventsClock {
  private val clocks =
    new java.util.concurrent.ConcurrentHashMap[String, () => Long]()
  def register(key: String, clock: () => Long): Unit = clocks.put(key, clock)
  def remove(key: String): Unit = clocks.remove(key)
  def nowMs(key: String): Long = {
    val c = clocks.get(key)
    if (c == null) System.currentTimeMillis() else c()
  }
}

object EventsConfig {
  def apply(o: CaseInsensitiveStringMap): EventsConfig = EventsConfig(
    numRows = o.getLong("numRows", 10000L),
    rateEps = o.getDouble("rateEps", 1000.0),
    startMs = o.getLong("startMs", 0L),
    sizeBytes = o.getInt("sizeBytes", 200),
    numPartitions = o.getInt("numPartitions", 4),
    // Streaming only: rows already "in the topic" when the consumer
    // starts (a Kafka consumer joining an existing topic) — gives
    // Trigger.AvailableNow a backlog to drain.
    backlogRows = o.getLong("backlogRows", 0L),
    // Streaming only: admission-control cap per micro-batch (the
    // maxOffsetsPerTrigger analog); -1 = unbounded.
    maxRowsPerTrigger = o.getLong("maxRowsPerTrigger", -1L),
    // Test-only: key of a registered EventsClock (default: wall clock).
    clockKey = o.getOrDefault("clockKey", ""))
}

class EventsTable(cfg: EventsConfig) extends Table with SupportsRead {
  override def name(): String = "graft_events"
  override def schema(): StructType = EventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new EventsScan(cfg)
    }
}

/** An index range [lo, hi) of the feed — the unit of parallelism. */
case class EventsRange(lo: Long, hi: Long, cfg: EventsConfig) extends InputPartition

object EventsRange {
  def split(lo: Long, hi: Long, n: Int, cfg: EventsConfig): Array[InputPartition] = {
    val total = math.max(0L, hi - lo)
    val parts = math.max(1, n)
    (0 until parts).map { p =>
      EventsRange(lo + total * p / parts, lo + total * (p + 1) / parts, cfg)
    }.filter(r => r.hi > r.lo).toArray[InputPartition]
  }

  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val r = partition.asInstanceOf[EventsRange]
      new PartitionReader[InternalRow] {
        private var i = r.lo - 1
        override def next(): Boolean = { i += 1; i < r.hi }
        override def get(): InternalRow = EventsSource.row(i, r.cfg)
        override def close(): Unit = ()
      }
    }
  }
}

class EventsScan(cfg: EventsConfig) extends Scan {
  override def readSchema(): StructType = EventsSource.schema
  override def description(): String = s"graft-events $cfg"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      EventsRange.split(0L, cfg.numRows, cfg.numPartitions, cfg)
    override def createReaderFactory(): PartitionReaderFactory =
      EventsRange.readerFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventsMicroBatchStream(cfg)
}

/** Offset = number of events emitted so far, PLUS the pacing epoch the
  * count is measured from. The epoch rides inside the checkpointed offset
  * JSON: a restart deserializes the committed offset, recovers the
  * ORIGINAL epoch, and the next `latestOffset` lands where the absolute
  * schedule says the feed should be by now — so the missed index range
  * replays as one catch-up batch (the recovery contract exp3 measures
  * against Kafka offsets), instead of a fresh clock regressing the
  * checkpoint and re-emitting delivered rows.
  */
case class EventsOffset(count: Long, epochMs: Long) extends Offset {
  override def json(): String = s"$count:$epochMs"
}

object EventsOffset {
  def parse(json: String): EventsOffset = {
    val Array(c, e) = json.split(':')
    EventsOffset(c.toLong, e.toLong)
  }
}

class EventsMicroBatchStream(cfg: EventsConfig) extends MicroBatchStream
    with SupportsTriggerAvailableNow {
  // The pacing epoch: set once at first start, restored from the
  // checkpointed offset on restart (deserializeOffset runs before any
  // latestOffset call in the restart path).
  @volatile private var epochMs: Long = -1L
  // Fixed end captured by prepareForTriggerAvailableNow (-1 = continuous
  // streaming; >= 0 = drain to exactly this count, then terminate).
  @volatile private var availableNowEnd: Long = -1L

  /** Feed position by the absolute schedule: the pre-existing backlog plus
    * whatever the pacing clock has emitted since the epoch.
    */
  private def paceCount(): Long = {
    if (epochMs < 0) epochMs = cfg.nowMs()
    val elapsed = (cfg.nowMs() - epochMs) / 1000.0
    cfg.backlogRows + math.max(0L, (elapsed * cfg.rateEps).toLong)
  }

  override def initialOffset(): Offset = {
    if (epochMs < 0) epochMs = cfg.nowMs()
    EventsOffset(0L, epochMs)
  }
  override def latestOffset(): Offset = EventsOffset(paceCount(), epochMs)

  // Trigger.AvailableNow contract: pin the end of the feed at prepare
  // time, serve it in admission-bounded batches, then report no new data
  // so the query terminates — the bounded-backfill mode a 100 TB catch-up
  // job runs in (Kafka's equivalent drains to the prepare-time end
  // offsets under maxOffsetsPerTrigger).
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowEnd = paceCount()
  }

  override def getDefaultReadLimit: ReadLimit =
    if (cfg.maxRowsPerTrigger > 0) ReadLimit.maxRows(cfg.maxRowsPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = if (availableNowEnd >= 0) availableNowEnd else paceCount()
    val from = start.asInstanceOf[EventsOffset].count
    val capped = limit match {
      case r: ReadMaxRows => math.min(target, from + r.maxRows)
      case _ => target
    }
    EventsOffset(math.max(from, capped), epochMs)
  }
  override def deserializeOffset(json: String): Offset = {
    val o = EventsOffset.parse(json)
    epochMs = o.epochMs
    o
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    EventsRange.split(start.asInstanceOf[EventsOffset].count,
      end.asInstanceOf[EventsOffset].count, cfg.numPartitions, cfg)
  override def createReaderFactory(): PartitionReaderFactory =
    EventsRange.readerFactory
}
