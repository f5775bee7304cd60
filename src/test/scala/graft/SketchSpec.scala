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
