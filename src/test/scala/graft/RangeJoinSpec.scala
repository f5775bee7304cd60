package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin
import graft.queries.AnalyticsQueries

/** ops/RangeJoin — the binned interval join: equality to the naive
  * non-equi join (including negative values, where binning must floor,
  * not truncate) and the plan claim (equi join, never a nested loop).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned interval join equals the naive non-equi join (incl. negatives)") {
    val points = Seq((1L, 5L), (2L, 100L), (3L, 250L), (4L, -70L), (5L, 300L),
      (6L, 0L), (7L, -128L)).toDF("pid", "v")
    val intervals = Seq((10L, 0L, 99L), (20L, 90L, 260L), (30L, -128L, -50L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(points, col("v"), intervals,
        col("lo"), col("hi"), binWidth = 64L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty && got == naive)
  }

  test("range_join_binned equals the naive interval join on fixture events") {
    val ev = graft.Tables.events(spark, sf0001).select(col("event_id"),
      col("event_type"), graft.Tables.tsMillis(col("ts")).as("ts_ms"))
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id".as("click_id"), $"ts_ms".as("click_ts"))
    val errors = ev.where($"event_type" === "error")
      .select($"event_id".as("err_id"),
        ($"ts_ms" - 300000L).as("lo"), ($"ts_ms" + 300000L).as("hi"))
    val naive = clicks.join(errors,
        $"click_ts" >= $"lo" && $"click_ts" <= $"hi")
      .groupBy($"err_id")
      .agg(count(lit(1)).as("n_clicks"), min($"click_id").as("first_click"))
      .as[(Long, Long, Long)].collect().toSet
    val binned = AnalyticsQueries.queries("range_join_binned")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(naive.nonEmpty && binned == naive)
  }

  test("binned join plans as an equi join, never nested-loop or cartesian") {
    val df = AnalyticsQueries.queries("range_join_binned")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"binned range join degenerated to a pairwise plan:\n$p")
    assert(p.contains("Join"), s"expected a join in:\n$p")
  }
}
