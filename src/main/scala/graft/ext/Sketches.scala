package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches (Apache DataSketches via Spark's native expression
  * surface) — the summary-statistics architecture at 100 TB: raw data is
  * scanned ONCE into KB-sized per-group sketches, and every coarser
  * question (any day range, any group union, the global total) is
  * answered by MERGING sketches — no second scan, no shuffle of raw
  * values, and each merge is associative so it parallelizes as a tree.
  *
  * Four sketch families, each a different question:
  *  - HLL (`hll_sketch_agg`): how many DISTINCT keys?
  *  - Theta (`theta_sketch_agg`): distinct keys under SET ALGEBRA —
  *    union/intersection/difference across groups (HLL can only union).
  *  - KLL (`kll_sketch_agg_double`): value QUANTILES, mergeable (unlike
  *    `percentile_approx`'s GK sketch, KLL partials are first-class rows
  *    that can be stored and re-merged later).
  *  - Frequent items (`approx_top_k_accumulate/_combine/_estimate`):
  *    heavy hitters with mergeable O(maxItemsTracked) state.
  *
  * Exactness contract: estimates carry each sketch's error bound (HLL
  * rse ≈ 1.04/sqrt(2^lgK); theta similar on the retained-set size; KLL
  * rank error ~1.7% at k=200; frequent-items EXACT while distinct items
  * ≤ maxItemsTracked), so the ORACLE-facing catalog twins
  * (`distinct_users_daily`, `user_type_overlap`, `frequent_users_topk`,
  * `percentile_surface`) are exact spellings, and `SketchSpec` pins each
  * sketch path to its twin within the bound — the same
  * exact-twin-plus-property-test pattern as the GK quantile sketch
  * (SURVEY §7.4.2).
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

  // ---- Theta: distinct counting under set algebra ----

  /** Per-group theta sketches of `keyCol`. Theta ≈ HLL for pure unions,
    * but its retained-sample representation also supports intersection
    * and difference — "users who did A but not B" over presummarized
    * state, no raw re-scan.
    */
  def thetaSketches(df: DataFrame, groupCols: Seq[Column], keyCol: Column,
      lgNomEntries: Int = 12): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(call_function("theta_sketch_agg", keyCol, lit(lgNomEntries)).as("sketch"))

  /** Estimated |A ∪ B|, |A ∩ B|, |A \ B| from two theta sketch columns
    * (scalar set algebra over single sketch rows).
    */
  def thetaSetOps(a: Column, b: Column): Seq[Column] = Seq(
    call_function("theta_sketch_estimate", call_function("theta_union", a, b))
      .as("est_union"),
    call_function("theta_sketch_estimate", call_function("theta_intersection", a, b))
      .as("est_intersect"),
    call_function("theta_sketch_estimate", call_function("theta_difference", a, b))
      .as("est_diff"))

  // ---- KLL: mergeable quantiles ----

  /** Per-group KLL quantile sketches of double-typed `valCol`. */
  def kllSketches(df: DataFrame, groupCols: Seq[Column], valCol: Column,
      k: Int = 200): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(call_function("kll_sketch_agg_double", valCol, lit(k)).as("sketch"))

  /** Merge pre-built KLL sketches to a coarser grouping and read the
    * given quantiles — the mergeable path that lets per-day quantile
    * state roll up to any date range without re-scanning values.
    */
  def kllRollup(sketches: DataFrame, groupCols: Seq[Column],
      qs: Seq[Double]): DataFrame = {
    val merged = call_function("kll_merge_agg_double", col("sketch"))
    val base = if (groupCols.isEmpty) sketches.groupBy() else sketches.groupBy(groupCols: _*)
    val reads = qs.zipWithIndex.map { case (q, i) =>
      call_function("kll_sketch_get_quantile_double", merged, lit(q)).as(s"q$i")
    }
    base.agg(reads.head, reads.tail: _*)
  }

  // ---- Frequent items: mergeable heavy hitters ----

  /** Per-group frequent-items state for `itemCol`. State size is
    * O(maxItemsTracked) regardless of input size; while a group's
    * distinct-item count stays ≤ maxItemsTracked the counts are EXACT
    * (the property SketchSpec pins against the exact twin).
    */
  def topkAccumulate(df: DataFrame, groupCols: Seq[Column], itemCol: Column,
      maxItemsTracked: Int = 10000): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(call_function("approx_top_k_accumulate", itemCol, lit(maxItemsTracked))
        .as("state"))

  /** Combine pre-built frequent-items states to a coarser grouping and
    * report the top k items per group as (item, count) structs.
    */
  def topkCombine(states: DataFrame, groupCols: Seq[Column], k: Int): DataFrame = {
    val merged = call_function("approx_top_k_combine", col("state"))
    val base = if (groupCols.isEmpty) states.groupBy() else states.groupBy(groupCols: _*)
    base.agg(call_function("approx_top_k_estimate", merged, lit(k)).as("topk"))
  }

  // ---- Count-min: mergeable point-frequency estimates ----

  /** Per-group count-min sketches of `itemCol` via Spark's native
    * `count_min_sketch` aggregate — the fifth family: "how OFTEN did this
    * key occur?" answered from O(w×d) counters instead of an exact
    * per-key count shuffle. The binary state rows are mergeable
    * ([[cmsMergeEstimate]]) because each counter matrix adds cellwise,
    * so per-day partials roll up to any date range like the HLL/KLL
    * families. Estimates only ever OVER-count (collision adds, min over
    * depth rows subtracts nothing), within eps·N with the configured
    * confidence — and for a fixed seed the collision structure is
    * DETERMINISTIC, so at small distinct-key cardinality (≪ width) the
    * estimates are exact, the property the catalog twin pins.
    */
  def cmsSketches(df: DataFrame, groupCols: Seq[Column], itemCol: Column,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(call_function("count_min_sketch", itemCol, lit(eps),
        lit(confidence), lit(seed)).as("sketch"))

  /** Merge pre-built count-min sketch rows (driver-side: the rows are
    * KB-sized counter matrices, the same footprint as any broadcast
    * build) and answer point queries for `probes`. This is the serving
    * read path — O(d) counter lookups per probe, raw data never
    * re-scanned.
    */
  def cmsMergeEstimate(spark: org.apache.spark.sql.SparkSession,
      sketchRows: DataFrame, probes: Seq[String]): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    import scala.jdk.CollectionConverters._
    val parts = sketchRows.select(col("sketch")).collect()
      .map(r => CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
    require(parts.nonEmpty, "no sketches to merge")
    val merged = parts.reduce { (a, b) => a.mergeInPlace(b); a }
    val rows = probes.sorted.map { p =>
      org.apache.spark.sql.Row(p, merged.estimateCount(p))
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("est_count",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
