package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 one-off: phase-by-phase timing of Graph.kCore's body on the
  * trade graph, to attribute the query's task-time before rewriting.
  * Dev probe, not driver contract.
  */
object KcoreDrill {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[kdrill] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // replicate GraphQueries.tradeEdges + Graph.kCore phases
    val base = time("base join+distinct+ckpt") {
      graft.Tables.orders(spark, d)
        .join(graft.Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("l_suppkey")).distinct()
        .localCheckpoint(false)
    }
    val lab = base.select(
      concat(lit("c"), col("o_custkey").cast("string")).as("c"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("sp"))
    val edges = lab.select(col("c").as("src"), col("sp").as("dst"))
      .unionAll(lab.select(col("sp").as("src"), col("c").as("dst")))
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") < col("v")).distinct()
    val sym = time("und distinct + sym ckpt") {
      und.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
        .localCheckpoint(false)
    }
    println("[kdrill] sym rows = " + sym.count())
    val deg0 = sym.groupBy(col("src")).agg(count(lit(1)).as("dg"))
    val k = time("percentile(deg0)") {
      math.ceil(deg0.agg(expr(s"percentile(dg, 0.75)").as("q"))
        .first().getDouble(0)).toLong
    }
    def restrict(e: DataFrame, alive: DataFrame): DataFrame = e
      .join(broadcast(alive.select(col("node").as("src"))), Seq("src"), "left_semi")
      .join(broadcast(alive.select(col("node").as("dst"))), Seq("dst"), "left_semi")
    var alive = time("alive0 distinct+ckpt") {
      sym.select(col("src").as("node")).distinct().localCheckpoint(false)
    }
    for (r <- 1 to 4) {
      alive = time(s"round $r") {
        restrict(sym, alive)
          .groupBy(col("src")).agg(count(lit(1)).as("dg"))
          .where(col("dg") >= k)
          .select(col("src").as("node"))
          .localCheckpoint(false)
      }
      println("[kdrill]   alive = " + alive.count())
    }
    time("final restrict+agg+count") {
      restrict(sym, alive)
        .groupBy(col("src")).agg(count(lit(1)).as("deg_core"))
        .select(col("src").as("node"), col("deg_core"), lit(k).as("k"))
        .count()
    }
    spark.stop()
  }
}
