package graft

import graft.ext.BradleyTerry
import graft.queries.EvalQueries
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("BradleyTerry.fit orders strengths by dominance and anchors the first player") {
    // A beats B 9/10, B beats C 9/10, A beats C 10/10 — transitive
    // dominance; the fit must order A > B > C with A (anchor) at 1e6.
    val matches =
      (Seq.fill(9)(("A", "B", "A")) ++ Seq(("A", "B", "B")) ++
       Seq.fill(9)(("B", "C", "B")) ++ Seq(("B", "C", "C")) ++
       Seq.fill(10)(("A", "C", "A")))
        .toDF("pa", "pb", "win")
    val got = BradleyTerry.fit(matches, "pa", "pb", "win", iters = 5)
      .orderBy("player")
      .as[(String, Long, Long, Long)].collect().toSeq
    val byPlayer = got.map(r => r._1 -> r).toMap
    assert(byPlayer("A")._2 == 19 && byPlayer("A")._3 == 20) // wins, matches
    assert(byPlayer("B")._2 == 10 && byPlayer("B")._3 == 20)
    assert(byPlayer("C")._2 == 1 && byPlayer("C")._3 == 20)
    assert(byPlayer("A")._4 == 1000000L, "anchor player pinned at 1e6")
    assert(byPlayer("A")._4 > byPlayer("B")._4 &&
      byPlayer("B")._4 > byPlayer("C")._4, s"monotone strengths: $got")
  }

  test("BradleyTerry.fit survives a zero-win player and an all-win player") {
    val matches = (Seq.fill(4)(("A", "B", "A")) ++ Seq.fill(4)(("A", "C", "A")))
      .toDF("pa", "pb", "win")
    val got = BradleyTerry.fit(matches, "pa", "pb", "win", iters = 5)
      .as[(String, Long, Long, Long)].collect().toSeq
    val byPlayer = got.map(r => r._1 -> r).toMap
    // zero-win players floor at the clamp, the undefeated anchor at 1e6
    assert(byPlayer("A")._4 == 1000000L)
    assert(byPlayer("B")._4 >= 1L && byPlayer("B")._4 < byPlayer("A")._4)
    assert(byPlayer("C")._4 >= 1L && byPlayer("C")._4 < byPlayer("A")._4)
  }

  test("rank_eval_ndcg invariants: bounded metrics, consistent gains") {
    val rows = EvalQueries.queries("rank_eval_ndcg")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    for ((qid, hits, dcg, ndcg, recall) <- rows) {
      assert(hits >= 0 && hits <= EvalQueries.NdcgK, s"q$qid hits=$hits")
      assert(dcg <= EvalQueries.IdcgMicro, s"q$qid dcg=$dcg")
      // each hit contributes between the smallest and largest gain
      assert(dcg >= hits * EvalQueries.GainMicro.last, s"q$qid dcg floor")
      assert(dcg <= hits * EvalQueries.GainMicro.head, s"q$qid dcg ceil")
      assert(ndcg == dcg * 1000000L / EvalQueries.IdcgMicro, s"q$qid ndcg")
      assert(recall == hits * 1000000L / EvalQueries.NdcgK, s"q$qid recall")
    }
    // the IVF system should find SOMETHING on the fixture (nprobe=4 of 16
    // cells; all-zero recall would mean the serving plan is broken)
    assert(rows.map(_._2).sum > 0, "IVF recall is zero across every query")
  }

  test("profile_columns matches direct aggregates on the fixture") {
    val prof = graft.queries.WarehouseQueries.queries("profile_columns")(spark, sf0001)
      .where($"col_name" === "o_custkey")
      .select("n_rows", "n_nulls", "n_distinct")
      .as[(Long, Long, Long)].collect().head
    val o = Tables.orders(spark, sf0001)
    assert(prof._1 == o.count())
    assert(prof._2 == o.where($"o_custkey".isNull).count())
    assert(prof._3 == o.select("o_custkey").distinct().count())
  }

  test("histogram rank-sum AUC equals the brute-force pairwise AUC") {
    import graft.ext.QualityModel
    val docs = Tables.documents(spark, sf0001)
    val m = QualityModel.train(docs)
    val sl = QualityModel.scoreLabeled(docs, m)
      .select(expr("cast(round(score * 1000000, 0) as bigint)"),
        $"y".cast("long"))
      .as[(Long, Long)].collect()
    val pos = sl.filter(_._2 == 1L).map(_._1)
    val neg = sl.filter(_._2 == 0L).map(_._1)
    // exact pairwise count in doubled units (ties count 1, wins 2)
    val wins2 = pos.map(p =>
      neg.map(n => if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
    val brute = wins2 * 1000000L / (2L * pos.length * neg.length)
    val got = EvalQueries.queries("eval_auc")(spark, sf0001)
      .as[(Long, Long, Long)].collect().head
    assert(got._1 == pos.length && got._2 == neg.length)
    assert(got._3 == brute, s"rank-sum ${got._3} vs brute $brute")
  }

  test("calibration bins are consistent: confidence within bin bounds, gap = |conf - acc|") {
    val rows = EvalQueries.queries("eval_calibration")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val n = rows.map(_._2).sum
    // every scored doc lands in exactly one bin
    assert(n == graft.ext.QualityModel.features(
      Tables.documents(spark, sf0001)).count())
    rows.foreach { case (bin, cnt, nPos, conf, acc, gap) =>
      assert(bin >= 0 && bin <= 9 && cnt > 0 && nPos >= 0 && nPos <= cnt)
      // mean confidence sits inside its own bin (bin 9 owns 1.0 too)
      assert(conf >= bin * 100000 &&
        (conf < (bin + 1) * 100000 || (bin == 9 && conf <= 1000000)),
        s"bin $bin conf $conf")
      assert(acc >= 0 && acc <= 1000000)
      assert(gap == math.abs(conf - acc))
    }
  }
}
