package graft

import org.apache.spark.sql.functions._

/** Sketch coverage beyond the GK quantile sketch: HyperLogLog distinct
  * counting — at 100 TB, exact `count(DISTINCT)` is a full shuffle of all
  * distinct values, while an HLL sketch is O(KB) per partition and
  * MERGEABLE, so per-partition/per-day sketches roll up without touching
  * rows again (the property these tests pin down).
  */
class SketchSpec extends SparkSpec {

  private lazy val ev = Tables.events(spark, sf0001)

  test("approx_count_distinct lands within 5% of exact") {
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_top_k heavy hitters match exact top-k on a skewed column") {
    // 5 distinct event types << maxItemsTracked, so the sketch is exact —
    // the property that makes approx_top_k a drop-in for "top pages /
    // top errors" dashboards at 100 TB (O(k) mergeable state vs a full
    // value shuffle for the exact grouped count).
    val approx = ev.select(expr("approx_top_k(event_type, 3, 100)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").cast("string"), col("e.count").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = ev.groupBy(col("event_type")).count()
      .orderBy(col("count").desc, col("event_type"))
      .limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(approx.sortBy(-_._2).map(_._2) == exact.map(_._2),
      s"approx=$approx exact=$exact")
    assert(approx.map(_._1).toSet == exact.map(_._1).toSet)
  }

  test("Sketches.groupSketches+rollup pins to the exact distinct_users_daily twin") {
    // The catalog's oracle-checked exact twin vs the sketch path at the
    // same grouping, and the merged global rollup vs global exact — both
    // within HLL rel-error (3 sigma at lgK=12 ≈ 5%).
    val exact = SparkEntry.queries("distinct_users_daily")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val sketches = graft.ext.Sketches.groupSketches(
      ev.withColumn("day", (Tables.tsMillis(col("ts")) / 86400000L).cast("long")),
      Seq(col("day")), col("user_id"))
    val est = graft.ext.Sketches.rollup(sketches, Seq(col("day")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(est.keySet == exact.keySet)
    for ((day, n) <- exact)
      assert(math.abs(est(day) - n) <= math.max(3, 0.05 * n),
        s"day=$day est=${est(day)} exact=$n")
    val globalExact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val globalEst = graft.ext.Sketches.rollup(sketches, Nil).head().getLong(0)
    assert(math.abs(globalEst - globalExact) <= math.max(3, 0.05 * globalExact),
      s"global est=$globalEst exact=$globalExact")
  }

  test("HLL sketches merge: per-type sketch union == global estimate") {
    // Build one sketch per event_type, union them, compare to the global
    // sketch — bit-identical estimates because union of partials IS the
    // global sketch (the mergeability that makes sketches scale).
    val global = ev.select(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n")).head().getLong(0)
    val merged = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .head().getLong(0)
    assert(merged == global, s"merged=$merged global=$global")
  }
}
