package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("banded lagOverTime matches the global window exactly (incl. ties)") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", Tables.tsMillis($"ts").as("ts_ms"))
    val global = ev
      .withColumn("prev", lag($"ts_ms", 1).over(Window.orderBy($"ts_ms", $"event_id")))
      .select($"event_id", $"prev").as[(String, Option[Long])].collect().toMap
    // narrow bands on purpose: many boundary rows exercise the fill path
    val banded = TimeSeries.lagOverTime(ev, $"ts_ms", $"event_id", width = 60L * 1000)
      .select($"event_id", $"_prev_ts").as[(String, Option[Long])].collect().toMap
    assert(banded == global)
  }

  test("trailingWindow matches the per-key global RANGE window exactly") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"event_type",
        (Tables.tsMillis($"ts") / 1000L).cast("long").as("sec"), $"value")
    val globalW = Window.partitionBy($"event_type").orderBy($"sec")
      .rangeBetween(-3600L, -1L)
    val global = ev
      .withColumn("n", count(lit(1)).over(globalW))
      .withColumn("mu", avg($"value").over(globalW))
      .select($"event_id", $"n", round($"mu", 9).as("mu"))
      .as[(String, Long, Option[Double])].collect().map { case (id, n, mu) => id -> (n, mu) }.toMap
    // chunkWidth barely above lookback: maximal context copying, many
    // chunk boundaries — the adversarial setting for the overlap logic.
    val banded = TimeSeries.trailingWindow(
        ev, Seq($"event_type"), $"sec", 3600L, 3600L) { w =>
      Seq("n" -> count(lit(1)).over(w), "mu" -> avg($"value").over(w))
    }
      .select($"event_id", $"n", round($"mu", 9).as("mu"))
      .as[(String, Long, Option[Double])].collect().map { case (id, n, mu) => id -> (n, mu) }.toMap
    assert(banded == global)
  }

  test("trailingWindow rejects a chunk narrower than the lookback") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"event_type",
        (Tables.tsMillis($"ts") / 1000L).cast("long").as("sec"), $"value")
    intercept[IllegalArgumentException] {
      TimeSeries.trailingWindow(ev, Seq($"event_type"), $"sec", 3600L, 1800L) {
        w => Seq("n" -> count(lit(1)).over(w))
      }
    }
  }

  test("gapToPrev: single null gap for the first event, rest non-negative") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", Tables.tsMillis($"ts").as("ts_ms"))
    val gaps = TimeSeries.gapToPrev(ev, $"ts_ms", $"event_id", width = 3600L * 1000)
      .select($"gap_ms").as[Option[Long]].collect()
    assert(gaps.count(_.isEmpty) == 1)
    assert(gaps.flatten.forall(_ >= 0))
  }
}
