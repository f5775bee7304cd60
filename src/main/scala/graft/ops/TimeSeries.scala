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
}
