package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-aware global time-series operators.
  *
  * The reference's gap analysis (`analyze_recovery.py:15`) is a lag over a
  * single global ordering. Spark's `Window.orderBy` with no partition key
  * executes that by moving EVERY row to one task ("No Partition Defined"
  * warning) — fine for a per-batch metrics table bounded by
  * time-range/trigger, fatal for a 100 TB event table. The operators here
  * keep a total order but never concentrate more than one time band on a
  * task.
  */
object TimeSeries {

  /** Global `lag(tsCol)` over the total order (tsCol, tieCol), computed
    * without a global window:
    *
    *  1. band rows by `bandStart = ts - ts mod width` — exact long
    *     arithmetic (no fp division), monotone in ts, so bands are
    *     contiguous ranges of the global order;
    *  2. lag within each band (`Window.partitionBy(band)`, parallel);
    *  3. each band's first row takes the previous non-empty band's last
    *     timestamp from a band-level boundary frame — one row per
    *     non-empty band, so its own ordering window is trivially small,
    *     broadcast back onto the banded frame.
    *
    * Cost at scale: one hash shuffle on band keys + a broadcast of
    * O(#bands) rows; no task ever holds more than a band. `width` trades
    * parallelism against boundary-frame size — pick bands that hold
    * minutes-to-hours of data.
    *
    * Requires non-null `tsCol` (long) values. Adds `_prev_ts`: the previous
    * row's ts in global order, null for the overall first row — identical
    * to `lag(ts) OVER (ORDER BY ts, tie)`.
    */
  def lagOverTime(df: DataFrame, tsCol: Column, tieCol: Column,
      width: Long): DataFrame = {
    val banded = df.withColumn("_band", tsCol - pmod(tsCol, lit(width)))
    val inBand = Window.partitionBy(col("_band")).orderBy(tsCol, tieCol)
    val local = banded.withColumn("_prev_ts", lag(tsCol, 1).over(inBand))
    // One row per non-empty band; the global window here is over the
    // boundary frame only (#bands rows), never the data.
    val bandLevel = Window.orderBy(col("_band"))
    val bounds = banded.groupBy(col("_band"))
      .agg(max(tsCol).as("_band_last"))
      .withColumn("_prev_band_last", lag(col("_band_last"), 1).over(bandLevel))
      .select(col("_band"), col("_prev_band_last"))
    local.join(broadcast(bounds), Seq("_band"), "left")
      .withColumn("_prev_ts", coalesce(col("_prev_ts"), col("_prev_band_last")))
      .drop("_band", "_prev_band_last")
  }

  /** Gap to the previous event in global (tsCol, tieCol) order — the W3
    * lag-difference, banded. Null gap for the first row overall.
    */
  def gapToPrev(df: DataFrame, tsCol: Column, tieCol: Column,
      width: Long, gapName: String = "gap_ms"): DataFrame =
    lagOverTime(df, tsCol, tieCol, width)
      .withColumn(gapName, tsCol - col("_prev_ts"))
      .drop("_prev_ts")

  /** Trailing RANGE-frame window aggregates with (key × time-chunk)
    * parallelism.
    *
    * `Window.partitionBy(keys).orderBy(sec).rangeBetween(-lookback, -1)`
    * is the natural spelling of "score each row against the preceding
    * `lookback` seconds of its key", but its parallelism is the number of
    * DISTINCT KEYS: for a low-cardinality key (a handful of event types
    * over a 100 TB stream) every row of a key lands on one task. This
    * operator restores parallelism with overlapping time chunks:
    *
    *  1. chunk rows by `sec - sec mod chunkWidth` (exact long arithmetic);
    *  2. rows within `lookback` of a chunk's end are COPIED into the next
    *     chunk as context (`chunkWidth >= lookback`, so one adjacent chunk
    *     always covers the frame — context fraction is lookback/chunkWidth);
    *  3. the same RANGE frame runs inside each (key, chunk) partition —
    *     a home row's trailing frame `[sec-lookback, sec-1]` is fully
    *     present: same-chunk rows natively, prior-chunk rows as context;
    *  4. context rows are dropped after the window.
    *
    * Cost at scale: one hash shuffle on (key, chunk) + a spillable
    * per-partition sort over ~chunkWidth of data — parallelism is
    * #keys × #chunks instead of #keys, and no task ever holds more than
    * one chunk (+ overlap) of one key.
    *
    * `aggs` receives the per-chunk WindowSpec and returns the named
    * trailing-frame columns, e.g. `w => Seq("mu" -> avg($"value").over(w))`.
    * Frame bounds are value-based on `sec` only, so results are identical
    * to the global window for any aggregate that is insensitive to
    * intra-frame order (count/sum/avg/min/max/stddev/...).
    */
  def trailingWindow(df: DataFrame, keys: Seq[Column], sec: Column,
      lookback: Long, chunkWidth: Long)(
      aggs: org.apache.spark.sql.expressions.WindowSpec => Seq[(String, Column)])
      : DataFrame = {
    require(chunkWidth >= lookback,
      s"chunkWidth ($chunkWidth) must cover the lookback ($lookback)")
    val off = pmod(sec, lit(chunkWidth))
    val home = df.withColumn("_chunk", sec - off).withColumn("_home", lit(true))
    val ctx = df.filter(off >= chunkWidth - lookback)
      .withColumn("_chunk", sec - off + chunkWidth)
      .withColumn("_home", lit(false))
    val w = Window.partitionBy((keys :+ col("_chunk")): _*)
      .orderBy(sec).rangeBetween(-lookback, -1)
    aggs(w).foldLeft(home.unionByName(ctx)) {
      case (d, (name, c)) => d.withColumn(name, c)
    }.filter(col("_home")).drop("_chunk", "_home")
  }
}
