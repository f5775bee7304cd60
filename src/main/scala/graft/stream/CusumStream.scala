package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming CUSUM — the at-ingest twin of the batch `ts_cusum` query.
  * The batch spelling derives its target from the whole series (H·n − T
  * deviations, closed-form prefix rewrite); a stream cannot see its
  * future, so the streaming detector takes the standard parametric form:
  * fixed target μ, allowance k and alarm threshold h (all in integer
  * micro-units of `value`), and carries the two one-sided sums as O(1)
  * state per key:
  *
  *   S⁺ ← max(0, S⁺ + (x − μ − k)),   S⁻ ← max(0, S⁻ − (x − μ) − k)
  *
  * Exactly the recurrence the batch query's window closed form is
  * spec-proved equal to (TimeSeriesSpec) — here it just runs forward.
  * All-integer (values ×1e6 with half-up rounding), so replaying the
  * same rows through any TIME-ORDERED batch split gives IDENTICAL
  * state, asserted in SessionizeSpec against a driver-side fold. The
  * max(0,·) recurrence is order-dependent: rows are sorted by
  * (ts_ms, event_id) only WITHIN each micro-batch, so a late row
  * (earlier event time arriving in a later batch) folds in arrival
  * order — the standard at-ingest CUSUM contract. Sources that can
  * deliver out-of-order events use [[streamOrdered]], which buffers
  * under the watermark and folds in strict event-time order.
  */
object CusumStream {

  case class CusumState(sUp: Long, sDown: Long, n: Long)
  case class KeyCusum(event_type: String, n: Long, cusum_up: Long,
    cusum_down: Long, alarm_up: Boolean, alarm_down: Boolean)

  /** Input frame columns: (event_type string, ts_ms long, event_id long,
    * value double); rows fold in (ts_ms, event_id) order within each
    * micro-batch, state carries across batches. Emits the running
    * detector state per key touched by the batch.
    */
  def stream(events: DataFrame, targetMicro: Long, kMicro: Long,
      hMicro: Long): Dataset[KeyCusum] = {
    import events.sparkSession.implicits._
    events.as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new CusumProcessor(targetMicro, kMicro, hMicro),
        TimeMode.None(), OutputMode.Append())
  }

  /** EVENT-TIME-ORDERED streaming CUSUM: the out-of-order-safe flavor of
    * [[stream]]. Rows buffer in ListState until the WATERMARK passes
    * their event time, then fold in strict (ts, event_id) order — so any
    * arrival order within the watermark delay produces IDENTICAL state
    * to the sorted driver fold (the guarantee [[stream]] only gives for
    * time-ordered batch splits; rows later than the watermark are
    * dropped by the upstream watermark operator, the standard
    * late-data contract). An event-time timer at the newest buffered
    * row's timestamp guarantees a key with no further arrivals still
    * flushes when the watermark passes it.
    *
    * Input: (event_type, ts timestamp, event_id, value) — the caller
    * sets `.withWatermark("ts", delay)`. State per key: the O(1) folded
    * CusumState plus a buffer bounded by (arrival rate × watermark
    * delay) — the price of strict event-time order, paid only within
    * the lateness window. Requires the RocksDB state store provider.
    */
  def streamOrdered(events: DataFrame, targetMicro: Long, kMicro: Long,
      hMicro: Long): Dataset[KeyCusum] = {
    import events.sparkSession.implicits._
    events.as[(String, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new OrderedCusumProcessor(targetMicro, kMicro, hMicro),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class PendingRow(ts_ms: Long, event_id: Long, value: Double)

  class OrderedCusumProcessor(target: Long, k: Long, h: Long)
      extends StatefulProcessor[String, (String, java.sql.Timestamp, Long, Double), KeyCusum] {

    @transient private var st: ValueState[CusumState] = _
    @transient private var buf: ListState[PendingRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)
      buf = getHandle.getListState[PendingRow]("pending",
        Encoders.product[PendingRow], TTLConfig.NONE)
    }

    /** Fold every buffered row the watermark has passed, in strict
      * (ts, event_id) order; re-buffer the rest and keep a timer armed
      * at the newest pending timestamp so the tail flushes without
      * further input.
      */
    private def flush(watermarkMs: Long): Iterator[KeyCusum] = {
      val pending = buf.get().toSeq
      val (ripe, hold) = pending.partition(_.ts_ms <= watermarkMs)
      if (ripe.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get() else CusumState(0L, 0L, 0L)
      ripe.sortBy(r => (r.ts_ms, r.event_id)).foreach { r =>
        val x = math.round(r.value * 1e6) - target
        s = CusumState(
          math.max(0L, s.sUp + x - k),
          math.max(0L, s.sDown - x - k),
          s.n + 1L)
      }
      st.update(s)
      buf.clear()
      if (hold.nonEmpty) buf.put(hold.toArray)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (hold.nonEmpty) getHandle.registerTimer(hold.map(_.ts_ms).max)
      Iterator.single(KeyCusum(currentKey, s.n, s.sUp, s.sDown,
        s.sUp > h, s.sDown > h))
    }

    // transformWithState hands the key to the callbacks; thread it to
    // flush without changing its signature
    @transient private var currentKey: String = _

    override def handleInputRows(key: String,
        rows: Iterator[(String, java.sql.Timestamp, Long, Double)],
        timerValues: TimerValues): Iterator[KeyCusum] = {
      currentKey = key
      var newest = Long.MinValue
      rows.foreach { r =>
        val t = r._2.getTime
        newest = math.max(newest, t)
        buf.appendValue(PendingRow(t, r._3, r._4))
      }
      if (newest != Long.MinValue) {
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(newest)
      }
      flush(timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[KeyCusum] = {
      currentKey = key
      flush(timerValues.getCurrentWatermarkInMs())
    }
  }

  class CusumProcessor(target: Long, k: Long, h: Long)
      extends StatefulProcessor[String, (String, Long, Long, Double), KeyCusum] {

    @transient private var st: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Long, Double)],
        timerValues: TimerValues): Iterator[KeyCusum] = {
      val ordered = rows.toSeq.sortBy(r => (r._2, r._3))
      var s = if (st.exists()) st.get() else CusumState(0L, 0L, 0L)
      ordered.foreach { r =>
        val x = math.round(r._4 * 1e6) - target
        s = CusumState(
          math.max(0L, s.sUp + x - k),
          math.max(0L, s.sDown - x - k),
          s.n + 1L)
      }
      if (ordered.nonEmpty) st.update(s)
      if (ordered.isEmpty) Iterator.empty
      else Iterator(KeyCusum(key, s.n, s.sUp, s.sDown,
        s.sUp > h, s.sDown > h))
    }
  }
}
