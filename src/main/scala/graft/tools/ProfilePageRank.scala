package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev dissection of graph_pagerank's cost structure at sf0.1: edge
  * build vs per-iteration marginal cost (run with SPARK_GRAFT_CPUS to
  * vary cores).
  */
object ProfilePageRank {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import org.apache.spark.sql.functions._
    // micro-stages
    for (pass <- 1 to 2) {
      t(s"m$pass: join only") {
        graft.Tables.orders(spark, dir)
          .join(graft.Tables.lineitem(spark, dir),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("l_suppkey"))
          .queryExecution.toRdd.count()
      }
      t(s"m$pass: join+distinct longs") {
        graft.Tables.orders(spark, dir)
          .join(graft.Tables.lineitem(spark, dir),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("l_suppkey")).distinct()
          .queryExecution.toRdd.count()
      }
      t(s"m$pass: join+concat+distinct") {
        graft.Tables.orders(spark, dir)
          .join(graft.Tables.lineitem(spark, dir),
            col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c"), col("o_custkey").cast("string")).as("c"),
            concat(lit("s"), col("l_suppkey").cast("string")).as("sp"))
          .distinct()
          .queryExecution.toRdd.count()
      }
    }
    // warm + staged dissection of the edge build
    for (pass <- 1 to 2) {
      val base0 = t(s"p$pass: orders⋈lineitem distinct") {
        val b = graft.Tables.orders(spark, dir)
          .join(graft.Tables.lineitem(spark, dir),
            col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c"), col("o_custkey").cast("string")).as("c"),
            concat(lit("s"), col("l_suppkey").cast("string")).as("sp"))
          .distinct()
        b.queryExecution.toRdd.count(); b
      }
      t(s"p$pass: symmetrize+checkpoint") {
        base0.select(col("c").as("src"), col("sp").as("dst"))
          .unionAll(base0.select(col("sp").as("src"), col("c").as("dst")))
          .localCheckpoint(true).count()
      }
      t(s"p$pass: full catalog query") {
        graft.SparkEntry.queries("graph_pagerank")(spark, dir)
          .queryExecution.toRdd.count()
      }
    }
    val edges = t("tradeEdges build+count") {
      val base = graft.Tables.orders(spark, dir)
        .join(graft.Tables.lineitem(spark, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("c"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("sp"))
        .distinct()
      val e = base.select(col("c").as("src"), col("sp").as("dst"))
        .unionAll(base.select(col("sp").as("src"), col("c").as("dst")))
        .localCheckpoint(true)
      println(s"[prof] edge rows: ${e.count()}")
      e
    }
    for (it <- Seq(0, 1, 2, 5)) {
      t(s"pageRank iters=$it") {
        graft.ext.Graph.pageRank(edges, "src", "dst", it)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
