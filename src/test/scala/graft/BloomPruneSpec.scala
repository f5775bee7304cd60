package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomPrune

/** Bloom-sketch join pruning (ops/BloomPrune): the pruned semi-join must
  * be bit-identical to the exact spelling (the sketch only PRE-filters),
  * and the sketch must have zero false negatives by construction.
  */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoinPruned == exact left-semi join (bloom only pre-filters)") {
    val probe = (1L to 20000L).toDF("k")
      .withColumn("payload", col("k") * 3)
    val build = (1L to 20000L).filter(_ % 97 == 0).toDF("k")
    val pruned = BloomPrune.semiJoinPruned(probe, build, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = probe.join(build, Seq("k"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == exact)
    assert(exact.size == 20000 / 97)
  }

  test("mightContain has no false negatives and prunes most misses") {
    val build = (1L to 1000L).map(_ * 1000000L).toDF("k")
    val sketch = BloomPrune.buildBloom(build, "k", fpp = 0.01)
    // every true key passes
    val hits = build.where(BloomPrune.mightContain(sketch, col("k"))).count()
    assert(hits == 1000L)
    // a disjoint probe set passes at ~fpp, not wholesale: the pruning is real
    val misses = (1L to 100000L).toDF("k")
      .where(col("k") % 1000000L =!= 0)
      .where(BloomPrune.mightContain(sketch, col("k"))).count()
    assert(misses < 2000L, s"false-positive passthrough too high: $misses")
  }

  test("decontaminate_bloom plan carries the sketch pre-filter") {
    val df = SparkEntry.queries("decontaminate_bloom")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom pre-filter missing from plan")
  }
}
