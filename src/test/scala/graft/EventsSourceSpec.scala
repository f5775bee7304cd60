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
    import graft.sources.{EventsConfig, EventsMicroBatchStream, EventsOffset}
    val cfg = EventsConfig(numRows = 0L, rateEps = 1000.0, startMs = 0L,
      sizeBytes = 200, numPartitions = 2)
    val run1 = new EventsMicroBatchStream(cfg)
    run1.initialOffset()
    Thread.sleep(1100)
    val committed = run1.latestOffset().asInstanceOf[EventsOffset]
    assert(committed.count > 0, "clock should have advanced past one second")
    // simulate crash + restart: a fresh stream deserializes the committed
    // offset (as the restart path does) and must NOT regress below it
    val run2 = new EventsMicroBatchStream(cfg)
    val restored = run2.deserializeOffset(committed.json())
      .asInstanceOf[EventsOffset]
    assert(restored == committed)
    val next = run2.latestOffset().asInstanceOf[EventsOffset]
    assert(next.epochMs == committed.epochMs,
      "restart must keep the original pacing epoch")
    assert(next.count >= committed.count,
      s"offset regressed across restart: ${next.count} < ${committed.count}")
  }

  test("AvailableNow drains the backlog in admission-bounded batches and terminates") {
    // backlog of 5000 pre-existing rows, pacing effectively frozen
    // (rateEps tiny), 2000-row admission cap per micro-batch: the query
    // must process exactly the prepare-time backlog across >= 3 batches,
    // then terminate on its own (the bounded-backfill contract).
    val q = spark.readStream.format("graft-events")
      .option("backlogRows", 5000).option("rateEps", 0.001)
      .option("maxRowsPerTrigger", 2000).option("numPartitions", 2)
      .load()
      .writeStream.outputMode("append")
      .format("memory").queryName("events_avail_now")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    assert(spark.table("events_avail_now").count() == 5000)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 3,
      s"5000 rows / 2000-row cap should be 3 batches, got ${batches.length}")
    assert(batches.map(_.numInputRows).sum == 5000)
  }

  test("micro-batch stream emits paced events through the standard machinery") {
    val q = spark.readStream.format("graft-events")
      .option("rateEps", 2000.0).option("numPartitions", 2)
      .load()
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("events_src")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      // the offset clock advances with wall time, so "all available" never
      // drains — poll until at least one batch has landed
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("events_src").isEmpty &&
             System.currentTimeMillis() < deadline)
        Thread.sleep(200)
    } finally q.stop()
    val rows = spark.table("events_src").as[(String, Long)].collect().toMap
    assert(rows.nonEmpty && rows.values.sum > 0,
      s"expected streamed events, got $rows")
    assert(rows.keySet.subsetOf(graft.model.Event.types.toSet))
  }
}
