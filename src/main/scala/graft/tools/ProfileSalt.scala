package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev profiler for the salted-join pipeline: times each stage of the
  * plan in isolation at the given SF dir to locate the scale bottleneck.
  */
object ProfileSalt {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_scale_x16")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[salt-profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val buckets = 8
    val fact = Tables.lineitem(spark, d).select(col("l_orderkey").as("o_orderkey"),
      col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
    val dim = Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderpriority"))
    def sizeOf(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"[salt-profile] stats: dim=${sizeOf(dim)} fact=${sizeOf(fact)} " +
      s"dataBytes=${sizeOf(dim) * buckets + sizeOf(fact)} " +
      s"parts=${((sizeOf(dim) * buckets + sizeOf(fact)) / (8L << 20)).max(BigInt(32))}")
    time("scan fact")(fact.count())
    time("scan dim")(dim.count())
    val salted = fact.withColumn("_salt", pmod(hash(col("l_linenumber")), lit(buckets)))
      .repartition(54, col("o_orderkey"), col("_salt"))
    time("probe salt+repartition")(salted.count())
    val repl0 = dim.withColumn("_salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    time("explode only")(repl0.count())
    val repl1 = repl0.repartition(54, col("o_orderkey"), col("_salt"))
    time("explode+hash-repartition")(repl1.count())
    val repl2 = dim.repartition(54).withColumn("_salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
      .repartition(54, col("o_orderkey"), col("_salt"))
    time("spread+explode+hash-repartition")(repl2.count())
    val joined = salted.join(repl2.hint("shuffle_hash"), Seq("o_orderkey", "_salt"))
      .drop("_salt")
    time("join+agg (full query shape)") {
      joined.groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority").collect()
    }
    val direct = fact.join(dim, "o_orderkey")
    time("DIRECT join+agg (baseline)") {
      direct.groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority").collect()
    }
    time("catalog query pass 1")(
      graft.SparkEntry.queries("salted_join_priority")(spark, d).count())
    time("catalog query pass 2")(
      graft.SparkEntry.queries("salted_join_priority")(spark, d).count())
    spark.stop()
  }
}
