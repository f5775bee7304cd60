package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) interval join — the SCALE path for point-in-interval
  * joins when NEITHER side fits a broadcast.
  *
  * A naive `points JOIN intervals ON v BETWEEN lo AND hi` has no equality
  * predicate, so Spark can only plan a broadcast nested-loop (or a
  * cartesian product when both sides are large): O(|points| × |intervals|)
  * comparisons. Binning restores an equi-key: every value/interval is
  * mapped to the fixed-width bins it touches, the join runs as an ordinary
  * hash/sort-merge join on the bin id, and the exact `BETWEEN` re-check
  * filters bin-mates that don't truly overlap. Cost becomes
  * O(|points| + Σ bins(interval) + |true matches|) — linear, shuffled by
  * bin, AQE-balanceable like any other key join.
  *
  * `binWidth` trades duplication for selectivity: an interval produces
  * `span/binWidth + 1` rows, a bin pairs every co-binned point×interval.
  * Pick binWidth ≈ the typical interval span so each interval lands in
  * O(1) bins and each bin holds only plausible matches (the same knob as
  * Databricks' range-join bin hint).
  *
  * Integer domain (longs) so bin assignment is exact on both engines.
  */
object RangeJoin {

  /** Join `points` (with long column `pv`) to `intervals` (with long
    * columns `lo`, `hi`, inclusive) on pv ∈ [lo, hi]. Columns from both
    * inputs survive; the `_bin` key is dropped. Intervals must satisfy
    * lo <= hi; values may be any sign (floorDiv handles negatives).
    */
  def binned(points: DataFrame, pv: Column, intervals: DataFrame,
      lo: Column, hi: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    // Floor division (not `div`, which truncates toward zero) so negative
    // values bin consistently with the interval expansion. pmod keeps the
    // arithmetic integral: c - pmod(c, w) is an exact multiple of w, so
    // the one double division is exact for |c| < 2^53 (any ms-timestamp
    // or cents-scaled money magnitude).
    def fdiv(c: Column): Column = ((c - pmod(c, w)) / w).cast("long")
    val p = points.withColumn("_bin", fdiv(pv))
    val iv = intervals.withColumn("_bin",
      explode(sequence(fdiv(lo), fdiv(hi))))
    p.join(iv, p("_bin") === iv("_bin") && pv >= lo && pv <= hi)
      .drop("_bin")
  }
}
