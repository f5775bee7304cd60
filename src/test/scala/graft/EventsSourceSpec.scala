package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** DataSourceV2 connector tests: the `graft-events` source must equal the
  * declarative EventGen generator bit-for-bit on the batch path (same
  * producer derivation rules), honor its partitioning option, and stream
  * through the standard micro-batch machinery.
  */
class EventsSourceSpec extends SparkSpec {
  import spark.implicits._

  test("batch read is bit-identical to EventGen.events") {
    val viaSource = spark.read.format("graft-events")
      .option("numRows", 5000).option("rateEps", 250.0)
      .option("startMs", 1700000000000L).option("sizeBytes", 150)
      .load()
    val viaGen = graft.gen.EventGen.events(spark, 5000, rateEps = 250.0,
      startMs = 1700000000000L, sizeBytes = 150)
      // EventGen keeps int-typed columns as computed; align column types
      .select($"event_id", $"created_ts", $"user_id".cast("int").as("user_id"),
        $"event_type", $"value", $"payload")
    assert(viaSource.schema.map(_.name) == viaGen.schema.map(_.name))
    assert(viaSource.except(viaGen).isEmpty && viaGen.except(viaSource).isEmpty,
      "connector and declarative generator must produce identical rows")
    assert(viaSource.count() == 5000)
  }

  test("numPartitions splits the index range partition-parallel") {
    val df = spark.read.format("graft-events")
      .option("numRows", 1000).option("numPartitions", 8).load()
    assert(df.rdd.getNumPartitions == 8)
    assert(df.select(countDistinct($"event_id")).first.getLong(0) == 1000)
  }

  test("restart restores the pacing epoch from the checkpointed offset") {
    import graft.sources.{EventsClock, EventsConfig, EventsMicroBatchStream, EventsOffset}
    // manual clock: timing assertions depend on controlled advances, not
    // wall-clock races under 32-way suite load
    @volatile var nowMs = 5000000L
    EventsClock.register("restart-test", () => nowMs)
    try {
      val cfg = EventsConfig(numRows = 0L, rateEps = 1000.0, startMs = 0L,
        sizeBytes = 200, numPartitions = 2, clockKey = "restart-test")
      val run1 = new EventsMicroBatchStream(cfg)
      run1.initialOffset()
      nowMs += 1100 // 1.1 s at 1000 eps = exactly 1100 events
      val committed = run1.latestOffset().asInstanceOf[EventsOffset]
      assert(committed.count == 1100L,
        s"absolute schedule: 1.1 s at 1000 eps must be 1100, got ${committed.count}")
      assert(committed.epochMs == 5000000L)
      // simulate crash + restart: a fresh stream deserializes the committed
      // offset (as the restart path does) and must NOT regress below it
      val run2 = new EventsMicroBatchStream(cfg)
      val restored = run2.deserializeOffset(committed.json())
        .asInstanceOf[EventsOffset]
      assert(restored == committed)
      val next = run2.latestOffset().asInstanceOf[EventsOffset]
      assert(next.epochMs == committed.epochMs,
        "restart must keep the original pacing epoch")
      assert(next.count == committed.count,
        s"frozen clock: restart must land exactly at the committed offset, got ${next.count}")
    } finally EventsClock.remove("restart-test")
  }

  test("AvailableNow drains the backlog in admission-bounded batches and terminates") {
    // backlog of 5000 pre-existing rows, pacing clock FROZEN (manual
    // clock, never advanced — no creep however long the suite stalls),
    // 2000-row admission cap per micro-batch: the query must process
    // exactly the prepare-time backlog across exactly 3 batches, then
    // terminate on its own (the bounded-backfill contract).
    graft.sources.EventsClock.register("avail-now-test", () => 7000000L)
    val q = spark.readStream.format("graft-events")
      .option("backlogRows", 5000).option("rateEps", 1000.0)
      .option("clockKey", "avail-now-test")
      .option("maxRowsPerTrigger", 2000).option("numPartitions", 2)
      .load()
      .writeStream.outputMode("append")
      .format("memory").queryName("events_avail_now")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
      assert(spark.table("events_avail_now").count() == 5000)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 3,
        s"5000 rows / 2000-row cap should be 3 batches, got ${batches.length}")
      assert(batches.map(_.numInputRows).sum == 5000)
    } finally graft.sources.EventsClock.remove("avail-now-test")
  }

  test("micro-batch stream emits paced events through the standard machinery") {
    // manual pacing clock: each poll iteration advances it 250 ms, so
    // event availability is driven by controlled time — only the trigger
    // machinery itself runs on wall clock (bounded by a generous deadline;
    // normally the first batch lands in well under a second).
    @volatile var nowMs = 9000000L
    graft.sources.EventsClock.register("stream-test", () => nowMs)
    val q = spark.readStream.format("graft-events")
      .option("rateEps", 2000.0).option("numPartitions", 2)
      .option("clockKey", "stream-test")
      .load()
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("events_src")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      // poll until at least one non-empty batch has landed
      val deadline = System.currentTimeMillis() + 120000
      while (spark.table("events_src").isEmpty &&
             System.currentTimeMillis() < deadline) {
        nowMs += 250 // 250 ms at 2000 eps = 500 more events available
        Thread.sleep(200)
      }
    } finally {
      q.stop()
      graft.sources.EventsClock.remove("stream-test")
    }
    val rows = spark.table("events_src").as[(String, Long)].collect().toMap
    assert(rows.nonEmpty && rows.values.sum > 0,
      s"expected streamed events, got $rows")
    assert(rows.keySet.subsetOf(graft.model.Event.types.toSet))
  }
}
