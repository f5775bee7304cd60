package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13 one-off: phase timing of the frontier-BFS closeness body. */
object ClosenessDrill {
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
      println(f"[cdrill] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val base = time("base pairs ckpt") {
      graft.Tables.orders(spark, d)
        .join(graft.Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("l_suppkey")).distinct()
        .localCheckpoint(false)
    }
    val lab = base.select((col("o_custkey") * 2).as("c"),
      (col("l_suppkey") * 2 + 1).as("sp"))
    val e = time("edges ckpt") {
      lab.select(col("c").as("src"), col("sp").as("dst"))
        .unionAll(lab.select(col("sp").as("src"), col("c").as("dst")))
        .localCheckpoint(false)
    }
    val srcs = time("srcs sample") {
      val dec = concat(when(col("node") % 2 === 0, lit("c")).otherwise(lit("s")),
        shiftright(col("node"), 1).cast("string"))
      e.select(col("src").as("node")).distinct()
        .select(col("node"), dec.as("lab"))
        .orderBy(md5(col("lab")), col("lab")).limit(16)
        .select(col("node")).localCheckpoint(false)
    }
    var frontier = srcs
      .select(col("node").as("qsrc"), col("node"), lit(0).as("d"))
      .localCheckpoint(false)
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var i = 1
    while (i <= 6 && !time(s"isEmpty r$i")(frontier.isEmpty)) {
      val visited = levels.map(_.select(col("qsrc"), col("node")))
        .reduce(_ unionAll _)
      frontier = time(s"round $i") {
        e.join(broadcast(frontier.select(col("qsrc"), col("node").as("src"))),
            Seq("src"))
          .select(col("qsrc"), col("dst").as("node")).distinct()
          .join(broadcast(visited), Seq("qsrc", "node"), "left_anti")
          .select(col("qsrc"), col("node"), lit(i).as("d"))
          .localCheckpoint(false)
      }
      println("[cdrill]   frontier rows = " + frontier.count())
      levels += frontier
      i += 1
    }
    time("final agg") {
      levels.reduce(_ unionByName _)
        .groupBy(col("qsrc").as("source"))
        .agg(sum(when(col("d") > 0, 1L).otherwise(0L)).as("n_reached"))
        .count()
    }
    spark.stop()
  }
}
