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

  test("ts_cusum window closed form equals the sequential CUSUM recurrence") {
    val rows = graft.queries.AnalyticsQueries
      .queries("ts_cusum")(spark, sf0001)
      .select($"event_type", $"bucket_sec", $"n", $"cusum_up", $"cusum_down")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, tr) =>
      val series = tr.sortBy(_._2)
      val h = series.length.toLong
      val t = series.map(_._3).sum
      val k = t / 4
      var (sUp, sDown) = (0L, 0L)
      series.foreach { case (_, _, n, gotUp, gotDown) =>
        val x = h * n - t
        sUp = math.max(0L, sUp + x - k)
        sDown = math.max(0L, sDown - x - k)
        assert(gotUp == sUp && gotDown == sDown)
      }
    }
  }

  test("ts_holtwinters fold equals the imperative Holt recurrence") {
    // replay from the query's own gap-filled series (ts_cusum emits it)
    val hourly = graft.queries.AnalyticsQueries
      .queries("ts_cusum")(spark, sf0001)
      .select($"event_type", $"bucket_sec", $"n")
      .as[(String, Long, Long)].collect()
    val got = graft.queries.AnalyticsQueries
      .queries("ts_holtwinters")(spark, sf0001)
      .select($"event_type", $"n_hours", $"level_micro", $"trend_micro",
        $"fc3_micro")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got.nonEmpty)
    hourly.groupBy(_._1).foreach { case (ty, tr) =>
      val ys = tr.sortBy(_._2).map(_._3 * 1000000L)
      var l = ys(0)
      var b = ys(1) - ys(0)
      ys.drop(1).foreach { y =>
        val nl = (2L * y + 8L * (l + b)) / 10L // Java / truncates like div
        b = (nl - l + 9L * b) / 10L
        l = nl
      }
      assert(got(ty) == ((ys.length.toLong, l, b, l + 3 * b)))
    }
  }

  test("Spark trunc-div spelling matches Java long division on negatives") {
    val vals = Seq(-27L, -21L, -20L, -1L, 0L, 1L, 19L, 20L, 27L)
    val got = vals.toDF("a")
      .select(((($"a" - $"a" % 10L) / 10L).cast("long")).as("d"))
      .as[Long].collect()
    assert(got.toSeq == vals.map(_ / 10L))
  }
}
