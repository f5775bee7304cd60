package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key global ranking without a per-key single-task sort — the
  * [[TimeSeries.lagOverTime]] band recipe applied to `row_number`.
  *
  * `row_number().over(Window.partitionBy(key).orderBy(value, tie))` has
  * parallelism = the number of DISTINCT KEYS: for a low-cardinality key
  * (a handful of languages over a 100 TB corpus) every row of a key must
  * sort on one task. Constant-k "rank ≤ k" cuts escape via the TopKPerKey
  * heap rewrite, but a FRACTIONAL cut (keep the best 80% of each key)
  * needs the full ranking, so the bare window is a corpus-fraction-sized
  * single-task sort. This operator restores (key × band) parallelism:
  *
  *  1. band rows by `floor(value / bandWidth)` — a pure monotone function
  *     of the rank value, so bands are contiguous ranges of each key's
  *     global (value, tie) order and equal values always share a band;
  *  2. `row_number` within each (key, band) partition — parallel, each
  *     task sorts only one band of one key;
  *  3. each band's global offset = the count of all earlier bands of the
  *     same key, computed on a band-level counts frame (one row per
  *     non-empty (key, band) — tiny) together with the per-key total,
  *     broadcast back onto the banded frame;
  *  4. global rank = band offset + in-band row_number.
  *
  * Cost at scale: one hash shuffle on (key, band) + a broadcast of
  * O(#key × #bands) count rows — no task ever sorts more than one band.
  * `bandWidth` trades parallelism against the boundary-frame size; skew
  * is bounded by how many rows share one band (ties on `value` cannot be
  * split — they are tie-broken inside a single band's sort).
  *
  * Adds `_rank` (identical to the bare per-key `row_number` over
  * (value, tie)) and `_n` (the per-key row count). `value` must be
  * non-null numeric; `tie` must make (value, tie) unique per key for the
  * rank to be deterministic.
  */
object BandedRank {
  def rank(df: DataFrame, keys: Seq[String], value: Column, tie: Column,
      bandWidth: Double): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val keyCols = keys.map(col)
    val banded = df.withColumn("_band",
      floor(value / lit(bandWidth)).cast("long"))
    val inBand = Window.partitionBy((keyCols :+ col("_band")): _*)
      .orderBy(value, tie)
    val local = banded.withColumn("_lr", row_number().over(inBand))
    // Band-level counts: one row per non-empty (key, band). The windows
    // below run over THIS frame only — never the data.
    val perKey = Window.partitionBy(keyCols: _*)
    val priorBands = perKey.orderBy(col("_band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = banded.groupBy((keyCols :+ col("_band")): _*)
      .agg(count(lit(1)).as("_bc"))
      .withColumn("_off", coalesce(sum(col("_bc")).over(priorBands), lit(0L)))
      .withColumn("_n", sum(col("_bc")).over(perKey))
      .select((keyCols :+ col("_band") :+ col("_off") :+ col("_n")): _*)
    local.join(broadcast(bounds), keys :+ "_band")
      .withColumn("_rank", col("_off") + col("_lr"))
      .drop("_band", "_lr", "_off")
  }
}
