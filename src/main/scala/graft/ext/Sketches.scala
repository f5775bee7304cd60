package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (Apache DataSketches HLL, via Spark's
  * native `hll_sketch_agg` family) — THE distinct-count architecture at
  * 100 TB: raw data is scanned ONCE into KB-sized per-group sketches, and
  * every coarser rollup (any day range, any group union, the global
  * total) is answered by merging sketches — no second scan, no
  * shuffle-heavy `count(DISTINCT)` over raw rows, and the merge is
  * associative so it parallelizes as a tree.
  *
  * Exactness contract: estimates carry HLL's relative standard error
  * (~1.04/sqrt(2^lgK), ≈1.6% at the default lgK=12), so the ORACLE-facing
  * catalog twin (`distinct_users_daily`) is the exact `count(DISTINCT)`
  * spelling, and `SketchesSpec` pins the sketch path to it within
  * rel-error bounds — the same exact-twin-plus-property-test pattern as
  * the quantile sketches (SURVEY §7.4.2).
  */
object Sketches {

  /** Per-group HLL sketches of `keyCol`: one scan, one partial-merge
    * shuffle of sketch bytes (not raw keys).
    */
  def groupSketches(df: DataFrame, groupCols: Seq[Column], keyCol: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(hll_sketch_agg(keyCol, lit(lgK)).as("sketch"))

  /** Merge pre-built sketches up to a coarser grouping and estimate.
    * Input rows are sketch-sized — this stage never touches raw data.
    */
  def rollup(sketches: DataFrame, groupCols: Seq[Column]): DataFrame = {
    val merged = hll_union_agg(col("sketch"), lit(true))
    val base = if (groupCols.isEmpty) sketches.groupBy() else sketches.groupBy(groupCols: _*)
    base.agg(hll_sketch_estimate(merged).as("est_distinct"))
  }
}
