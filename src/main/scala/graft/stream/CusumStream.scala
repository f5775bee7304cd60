package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
  * deliver out-of-order events need an upstream watermark+sort stage
  * if strict event-time order matters.
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
