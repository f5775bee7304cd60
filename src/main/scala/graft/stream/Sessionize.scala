package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization — the canonical custom-state streaming operator the
  * reference lacks (SURVEY §2.6 "absent features"): group a user's events
  * into sessions separated by inactivity gaps.
  *
  * Two implementations with identical semantics:
  *  - `batch`: lag-window + cumulative-sum session ids — declarative, one
  *    shuffle on the user key, oracle-checkable in SQL.
  *  - `stream`: `flatMapGroupsWithState` keeping (start, last, count) per
  *    user; a session is emitted when a later event opens the next one.
  *    State is O(1) per key — the scale-safe shape for unbounded streams.
  */
object Sessionize {

  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long)

  /** Batch flavor over (user_id, ts_ms [, tiebreak id]) columns. */
  def batch(events: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val newSession = when(
      lag(col("ts_ms"), 1).over(byUser).isNull ||
        col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > gapMs, 1L).otherwise(0L)
    events
      .withColumn("_new", newSession)
      .withColumn("session_seq", sum(col("_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .drop("session_seq")
  }

  /** Streaming flavor over a Dataset of (user_id, ts_ms). Emits each
    * session once its successor opens (append mode, NoTimeout — a
    * production variant would add an event-time timeout to flush idle
    * sessions against the watermark).
    */
  def stream(events: Dataset[(Long, Long)], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) => {
          val times = rows.map(_._2).toSeq.sorted
          var st = state.getOption
          val closed = Seq.newBuilder[Session]
          times.foreach { t =>
            st match {
              case Some(s) if t - s.last <= gapMs =>
                st = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
              case Some(s) =>
                closed += Session(user, s.start, s.last, s.n)
                st = Some(SessionState(t, t, 1))
              case None =>
                st = Some(SessionState(t, t, 1))
            }
          }
          st.foreach(state.update)
          closed.result().iterator
        })
  }
}
