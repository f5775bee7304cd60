package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ext.{Dedup, TextOps}

/** Dev profiling harness for the dup_span_ratio plan stages (not part of
  * the driver contract): isolates window-hash explode, the (h, doc)
  * pre-aggregation, checkpoint materialization, the nd aggregation, and
  * the join-back, at an arbitrary corpus dir (e.g. the ScaleProbe 16×
  * build) to show where superlinear time goes.
  */
object ProfileDupSpan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_scale_x16")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "128")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = documents(spark, d)
    println("docs=" + docs.count())
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val wh = docs
        .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
        .select(col("doc_id"), TextOps.hashAll(col("_toks")).as("_th"))
        .select(col("doc_id"),
          explode(Dedup.shingleHashes(col("_th"), graft.queries.CorpusQueries.DupSpanW)).as("h"))
      time("window-hash explode")(println("wh=" + wh.count()))
      val whcPlain = wh.groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      time("(h,doc) pre-agg")(println("whc=" + whcPlain.count()))
      val whc = whcPlain.localCheckpoint(false)
      time("checkpoint materialize")(println("ck=" + whc.count()))
      val nd = whc.groupBy("h").agg(count(lit(1)).as("nd"))
      time("nd agg")(println("nd=" + nd.count()))
      time("join-back + final agg")(println("rows=" +
        whc.join(nd, "h").groupBy("doc_id")
          .agg(sum(col("c")).as("n_windows")).count()))
      time("full query")(println("full=" +
        graft.queries.CorpusQueries.queries("dup_span_ratio")(spark, d).count()))
      // Variant A: no checkpoint — both branches share the pre-agg
      // Exchange via ReuseExchange inside the single action.
      val whcA = wh.groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      val ndA = whcA.groupBy("h").agg(count(lit(1)).as("nd"))
      time("variant A (no checkpoint)")(println("a=" +
        whcA.join(ndA, "h").groupBy("doc_id")
          .agg(sum(col("c")).as("n_windows"),
            sum(when(col("nd") > 1, col("c")).otherwise(lit(0L))).as("n_dup"))
          .count()))
      // Variant B: eager checkpoint (materialize first, then one action).
      val whcB = time("variant B ck materialize")(
        wh.groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
          .localCheckpoint(true))
      val ndB = whcB.groupBy("h").agg(count(lit(1)).as("nd"))
      time("variant B (eager ck) query")(println("b=" +
        whcB.join(ndB, "h").groupBy("doc_id")
          .agg(sum(col("c")).as("n_windows"),
            sum(when(col("nd") > 1, col("c")).otherwise(lit(0L))).as("n_dup"))
          .count()))
    }
    spark.stop()
  }
}
