package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopK

/** The custom TopKPerKey physical operator: row-set equality with the
  * window row_number spelling, and the plan-shape claim (heap, not sort).
  */
class TopKSpec extends SparkSpec {

  /** Run `body` with RankLimitRewrite excluded, so window spellings stay
    * genuine windows (otherwise equivalence tests compare TopK to itself).
    */
  private def withoutRewrite[T](body: => T): T = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      (prev.toSeq :+ "graft.plans.RankLimitRewrite").mkString(","))
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("TopK.perKey == row_number()<=k under a total order") {
    val o = Tables.orders(spark, sf0001)
    val got = TopK.perKey(o, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
      .collect().map(_.toSeq).toSet
    val expect = withoutRewrite {
      val e = o.withColumn("_rk", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .where(col("_rk") <= 2).drop("_rk")
      assert(e.queryExecution.optimizedPlan.toString.contains("Window"),
        "exclusion failed: expected a genuine window plan")
      e.collect().map(_.toSeq).toSet
    }
    assert(got == expect)
  }

  test("RankLimitRewrite: row_number()<=k spelling auto-plans as TopKPerKey") {
    val o = Tables.orders(spark, sf0001)
    val rewritten = o.withColumn("_rk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .where(col("_rk") <= 2 && col("o_totalprice") > 1000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val p = rewritten.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"rule did not fire:\n$p")
    assert(!p.contains("Window"), s"window survived the rewrite:\n$p")
    // value-preservation vs the un-rewritten plan (residual predicate
    // applies AFTER ranking in both)
    val expect = withoutRewrite {
      o.withColumn("_rk", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .where(col("_rk") <= 2 && col("o_totalprice") > 1000.0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .collect().map(_.toSeq).toSet
    }
    assert(rewritten.collect().map(_.toSeq).toSet == expect)
  }

  test("RankLimitRewrite leaves plans that KEEP the rank column alone") {
    val o = Tables.orders(spark, sf0001)
    val kept = o.withColumn("_rk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .where(col("_rk") <= 2)
      .select(col("o_orderkey"), col("_rk"))
    val p = kept.queryExecution.executedPlan.toString
    assert(!p.contains("TopKPerKey") && p.contains("Window"),
      s"rank column is in the output — rewrite must not fire:\n$p")
  }

  test("TopK.perKey with k larger than any group keeps everything") {
    val n = Tables.nation(spark, sf0001)
    val got = TopK.perKey(n, Seq("n_regionkey"), Seq(("n_nationkey", false)), 1000)
    assert(got.count() == n.count())
  }

  test("TopKPerKeyExec plans with an exchange but NO sort") {
    val o = Tables.orders(spark, sf0001)
    val p = TopK.perKey(o, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"custom operator missing:\n$p")
    assert(p.contains("Exchange hashpartitioning"), s"expected key shuffle:\n$p")
    assert(!p.linesIterator.exists(_.trim.startsWith("+- Sort")) &&
      !p.linesIterator.exists(_.trim.startsWith("Sort")),
      s"top-k must not sort the partitions:\n$p")
  }

  test("spill fallback: over-budget partitions degrade to sort-based top-k, same rows") {
    // a tiny byte budget forces every partition over the heap-map budget
    // immediately, so the whole input runs through the external-sort
    // fallback — the result must be bit-identical to the window spelling
    val key = "spark.graft.topk.spillBytes"
    spark.conf.set(key, "1024")
    try {
      val o = Tables.orders(spark, sf0001)
      val got = TopK.perKey(o, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
        .collect().map(_.toSeq).toSet
      val expect = withoutRewrite {
        o.withColumn("_rk", row_number().over(
            Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
          .where(col("_rk") <= 2).drop("_rk")
          .collect().map(_.toSeq).toSet
      }
      assert(got == expect, "sort-based fallback must keep exactly the top-k rows")
    } finally spark.conf.unset(key)
  }

  test("spill fallback: mid-stream overflow (heap partially filled) loses nothing") {
    // budget sized so the heap map absorbs part of the input before
    // tripping: the fallback must merge held rows + remaining input
    val key = "spark.graft.topk.spillBytes"
    spark.conf.set(key, "16384")
    try {
      val li = Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val got = TopK.perKey(li, Seq("l_orderkey"),
        Seq(("l_extendedprice", true), ("l_linenumber", false)), 1)
        .collect().map(_.toSeq).toSet
      val expect = withoutRewrite {
        li.withColumn("_rk", row_number().over(
            Window.partitionBy(col("l_orderkey"))
              .orderBy(col("l_extendedprice").desc, col("l_linenumber"))))
          .where(col("_rk") <= 1).drop("_rk")
          .collect().map(_.toSeq).toSet
      }
      assert(got == expect)
    } finally spark.conf.unset(key)
  }

  test("floating-point keys: -0.0/0.0 and NaN bit patterns form ONE group, both modes") {
    // grouping keys are normalized like Spark's groupBy/window keys
    // (NormalizeFloatingNumbers): -0.0 == 0.0, all NaN payloads equal.
    // Un-normalized, byte-distinct equal keys split heaps in heap mode and
    // reset the fallback group scan mid-group (emitting > k rows/key).
    val df = spark.range(40).select(
      // four logical keys; 0-keys alternate +0.0/-0.0, NaN keys alternate
      // bit patterns via a double that parses to NaN either way
      when(col("id") % 4 === 0, lit(0.0))
        .when(col("id") % 4 === 1, lit(-0.0))
        .when(col("id") % 4 === 2, expr("cast('NaN' as double)"))
        .otherwise(expr("acos(2.0)")).as("k"), // acos(2) = NaN, possibly distinct bits
      col("id").as("v"))
    def check(): Unit = {
      val got = TopK.perKey(df, Seq("k"), Seq(("v", false)), 2).collect()
      // two logical keys (zero, NaN) -> at most 2 rows each
      assert(got.length == 4, s"expected 4 rows (2 keys x k=2), got ${got.length}")
      val zeros = got.filter(r => !r.getDouble(0).isNaN).map(_.getLong(1)).sorted
      val nans = got.filter(r => r.getDouble(0).isNaN).map(_.getLong(1)).sorted
      assert(zeros.toSeq == Seq(0L, 1L), s"zero group kept ${zeros.toSeq}")
      assert(nans.toSeq == Seq(2L, 3L), s"NaN group kept ${nans.toSeq}")
    }
    check() // heap mode
    spark.conf.set("spark.graft.topk.spillBytes", "1")
    try check() // sort-fallback mode
    finally spark.conf.unset("spark.graft.topk.spillBytes")
  }

  test("TopK.perKey rejects unknown columns") {
    val o = Tables.orders(spark, sf0001)
    intercept[IllegalArgumentException] {
      TopK.perKey(o, Seq("nope"), Seq(("o_orderkey", false)), 1)
    }
  }
}
