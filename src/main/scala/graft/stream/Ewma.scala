package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming EWMA — the unbounded-key-history scale path for the batch
  * `ewma_user_value` query (queries/PipelineQueries.scala): the batch
  * spelling is a SEGMENTED fold whose per-key state above the chunk level
  * is n/EwmaChunk summaries; this stateful operator is the limit of that
  * segmentation — each micro-batch is "a chunk", the carried state is ONE
  * (ewma, n) pair per key, O(1) forever regardless of history length.
  *
  * The fold step is the identical IEEE sequence as the batch query
  * (y' = y*0.5 + v*0.5, seeded by the key's first value), so replaying a
  * corpus through the stream reproduces the batch result bit-for-bit
  * (asserted in SessionizeSpec).
  */
object Ewma {

  case class EwmaState(ewma: Double, n: Long)
  case class UserEwma(user_id: Long, n: Long, ewma: Double)

  /** Input frame columns: (user_id long, ts_ms long, event_id long,
    * value double). Rows are folded in (ts_ms, event_id) order within
    * each micro-batch; state carries across batches, so batches must
    * arrive time-ordered per key (the Kafka/connector delivery order).
    * Emits the running (n, ewma) per user touched by the batch.
    */
  def stream(events: DataFrame): Dataset[UserEwma] = {
    import events.sparkSession.implicits._
    events.as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new EwmaProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  class EwmaProcessor
      extends StatefulProcessor[Long, (Long, Long, Long, Double), UserEwma] {

    @transient private var st: ValueState[EwmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[EwmaState]("ewma",
        Encoders.product[EwmaState], TTLConfig.NONE)

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long, Double)],
        timerValues: TimerValues): Iterator[UserEwma] = {
      val ordered = rows.toSeq.sortBy(r => (r._2, r._3))
      var s = if (st.exists()) Option(st.get()) else None
      ordered.foreach { r =>
        s = Some(s match {
          case None => EwmaState(r._4, 1L)
          case Some(EwmaState(y, n)) => EwmaState(y * 0.5 + r._4 * 0.5, n + 1L)
        })
      }
      s.foreach(st.update)
      s.map(x => UserEwma(user, x.n, x.ewma)).iterator
    }
  }
}
