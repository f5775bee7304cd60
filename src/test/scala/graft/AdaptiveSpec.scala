package graft

import org.apache.spark.sql.functions._

/** Runtime re-planning audits — the knobs a 100 TB deployment leans on,
  * proven to actually engage on this build of Spark:
  *
  *  - AQE skew-join: a hot key's shuffle partition is split at runtime
  *    into multiple tasks (the automatic twin of `ops/Salt`'s manual
  *    salting — SURVEY §2 skew mitigation).
  *  - Runtime bloom-filter injection: a selective filter on one join side
  *    becomes a `might_contain` pre-filter on the fact side's scan, so
  *    rows that cannot match never reach the shuffle.
  */
class AdaptiveSpec extends SparkSpec {
  import spark.implicits._

  /** Set confs, run the body, restore previous values. */
  private def withConfs[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // ~95% of fact rows land on key 0: one shuffle partition dwarfs the
      // rest, exactly the shape AQE's OptimizeSkewedJoin targets.
      val fact = spark.range(200000).select(
        when($"id" % 20 === 0, $"id" % 37).otherwise(lit(0L)).as("k"),
        $"id".as("v"))
      val dim = spark.range(37).select($"id".as("k"), ($"id" * 10).as("w"))
      // No aggregate downstream: a post-join shuffle requirement would
      // veto OptimizeSkewedJoin (it refuses to break the join's output
      // partitioning unless forceOptimizeSkewedJoin).
      val joined = fact.join(dim, "k")
      // Execute THIS QueryExecution (count() builds a separate one) so
      // the adaptive plan finalizes from runtime shuffle statistics.
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"skewed partition was not split at runtime:\n$p")
    }
  }

  test("AQE coalesces post-shuffle partitions when outputs are small") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "32") {
      // a 5-group aggregate through a 32-partition shuffle: the fixed
      // partition count is a cluster-sized default, the output is tiny —
      // AQE must shrink the read side at runtime instead of scheduling
      // 32 near-empty tasks (at 100 TB this is thousands of wasted tasks
      // per stage for late-pipeline small aggregates).
      val df = Tables.events(spark, sf0001)
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
        s"post-shuffle partitions were not coalesced:\n$p")
      assert(df.rdd.getNumPartitions < 32,
        s"expected coalesced read, got ${df.rdd.getNumPartitions} partitions")
    }
  }

  test("runtime bloom filter from a selective dim filter prunes the fact side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val urgent = Tables.orders(spark, sf0001)
        .where($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
      val joined = Tables.lineitem(spark, sf0001)
        .join(urgent, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag").agg(sum($"l_quantity").as("q"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter injected on the fact side:\n$p")
    }
  }
}
