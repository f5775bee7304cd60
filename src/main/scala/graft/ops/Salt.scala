package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation pattern: two-phase salted aggregation. A hot grouping
  * key that would funnel into one reducer is split across `buckets`
  * partial groups (salt = hash of a row-unique column, deterministic),
  * partially aggregated, then combined — the classic manual counterpart to
  * AQE's skew-join splitting, for aggregations. Only mergeable aggregates
  * (sum/count/min/max) compose this way; the result is identical to the
  * direct groupBy.
  */
object Salt {

  /** Skew-mitigation for JOINS: the build side is replicated `buckets`
    * ways (one copy per salt value) and the probe side is salted
    * deterministically, so one hot join key fans out over `buckets`
    * reducers instead of funneling into one. The join result is identical
    * to the unsalted join — the salt column is an equi-join key match by
    * construction. Use when AQE skew splitting can't help (e.g. the skew
    * is in a grouping that follows the join and the join output must stay
    * co-partitioned).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltSource: Column, buckets: Int): DataFrame = {
    val salted = probe.withColumn("_salt", pmod(hash(saltSource), lit(buckets)))
    val replicated = build.withColumn("_salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    // shuffle_hash: a salted join exists to feed downstream aggregation,
    // so the sort-merge sort of both (replicated!) sides is pure waste —
    // hash-build the replicated side per partition instead.
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt")
  }

  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltSource: Column,
      buckets: Int, sums: Seq[String] = Nil, counts: Boolean = true,
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    val salt = pmod(hash(saltSource), lit(buckets)).as("_salt")
    val partialAggs =
      sums.map(c => sum(col(c)).as(s"_sum_$c")) ++
        (if (counts) Seq(count(lit(1)).as("_cnt")) else Nil) ++
        mins.map(c => min(col(c)).as(s"_min_$c")) ++
        maxs.map(c => max(col(c)).as(s"_max_$c"))
    val partial = df
      .groupBy((keyCols.map(col) :+ salt): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sums.map(c => sum(col(s"_sum_$c")).as(s"sum_$c")) ++
        (if (counts) Seq(sum(col("_cnt")).as("n")) else Nil) ++
        mins.map(c => min(col(s"_min_$c")).as(s"min_$c")) ++
        maxs.map(c => max(col(s"_max_$c")).as(s"max_$c"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
