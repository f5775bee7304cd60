package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopK

/** The custom TopKPerKey physical operator: row-set equality with the
  * window row_number spelling, and the plan-shape claim (heap, not sort).
  */
class TopKSpec extends SparkSpec {

  test("TopK.perKey == row_number()<=k under a total order") {
    val o = Tables.orders(spark, sf0001)
    val got = TopK.perKey(o, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
    val expect = o.withColumn("_rk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .where(col("_rk") <= 2).drop("_rk")
    assert(got.count() == expect.count())
    assert(got.except(expect).count() == 0 && expect.except(got).count() == 0)
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

  test("TopK.perKey rejects unknown columns") {
    val o = Tables.orders(spark, sf0001)
    intercept[IllegalArgumentException] {
      TopK.perKey(o, Seq("nope"), Seq(("o_orderkey", false)), 1)
    }
  }
}
