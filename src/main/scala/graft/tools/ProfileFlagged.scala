package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.ext.TextOps

/** Stage-by-stage dissection of the queries the r6 whole-catalog 8×
  * sweep flagged as superlinear (dev tool): times each building block of
  * the text-family and normalized-dedup plans at sf0.1 and at the 8×
  * probe corpus, so the superlinear term is attributed to a STAGE, not
  * guessed. Honest materialization via toRdd.count throughout.
  */
object ProfileFlagged {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val big = args.headOption.getOrElse("/tmp/graft_scale_x8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def t2(name: String)(mk: String => DataFrame): Unit = {
      def one(d: String): Double = {
        val t0 = System.nanoTime(); force(mk(d)); (System.nanoTime() - t0) / 1e9
      }
      one(base) // warm
      val tb = math.min(one(base), one(base))
      val tg = math.min(one(big), one(big))
      println(f"[flagged] $name%-34s ${tb}%7.2f ${tg}%7.2f  ${tg / tb}%5.1f")
    }

    println(f"[flagged] ${"stage"}%-34s ${"sf0.1"}%7s ${"x8"}%7s  ratio")
    // --- corpus shape ---
    for (d <- Seq(base, big)) {
      val n = documents(spark, d).count()
      val chars = documents(spark, d).agg(sum(length(col("text")))).head.getLong(0)
      val splits = documents(spark, d).select(col("text"))
        .queryExecution.toRdd.getNumPartitions
      println(s"[flagged] corpus $d: $n docs, $chars chars, $splits input splits")
    }

    // --- text_stats stages ---
    t2("scan text only")(d => documents(spark, d).select(col("text")))
    t2("tokens (split)")(d => documents(spark, d)
      .select(TextOps.tokens(col("text")).as("t")))
    t2("punctCount regex")(d => documents(spark, d)
      .select(TextOps.punctCount(col("text")).as("p")))
    t2("stopwordCount")(d => documents(spark, d)
      .select(TextOps.stopwordCount(TextOps.tokens(col("text"))).as("s")))
    t2("avg_token_len fold")(d => documents(spark, d)
      .select(TextOps.tokens(col("text")).as("_toks"))
      .select(round(aggregate(transform(col("_toks"), t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x).cast("double") / size(col("_toks")), 6).as("a")))
    t2("bpeTokenCount regex")(d => documents(spark, d)
      .select(TextOps.bpeTokenCount(col("text")).as("b")))
    t2("text_stats NO sort")(d => graft.SparkEntry.queries("text_stats")(spark, d)
      .queryExecution.analyzed match { case _ =>
        documents(spark, d)
          .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("_toks"))
          .select(col("doc_id"), size(col("_toks")).as("n_tokens"),
            length(col("text")).as("n_chars_calc"),
            TextOps.punctCount(col("text")).as("n_punct"),
            TextOps.stopwordCount(col("_toks")).as("n_stopwords"),
            round(aggregate(transform(col("_toks"), t => length(t).cast("long")),
              lit(0L), (acc, x) => acc + x).cast("double") / size(col("_toks")), 6)
              .as("avg_token_len"))
      })
    t2("text_stats full (with sort)")(d =>
      graft.SparkEntry.queries("text_stats")(spark, d))

    // --- dedup_normalized stages ---
    t2("normalize+md5 project")(d => documents(spark, d)
      .select(md5(TextOps.normalize(col("text"))).as("k")))
    t2("dedup_normalized NO sort")(d => documents(spark, d)
      .groupBy(md5(TextOps.normalize(col("text"))).as("norm_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies")))
    t2("dedup_normalized full")(d =>
      graft.SparkEntry.queries("dedup_normalized")(spark, d))

    // --- dedup_fuzzy_verify stages ---
    t2("fuzzy: group sizes")(d => {
      val n = documents(spark, d)
        .select(col("doc_id"), md5(TextOps.normalize(col("text"))).as("k"))
      n.groupBy("k").agg(count(lit(1)).as("m")).where(col("m") > 1)
    })
    t2("fuzzy: pair count no lev")(d => {
      val n = documents(spark, d)
        .select(col("doc_id"), md5(TextOps.normalize(col("text"))).as("k"))
      val l = n.select(col("k"), col("doc_id").as("id_a"))
      val r = n.select(col("k"), col("doc_id").as("id_b"))
      l.join(r, Seq("k")).where(col("id_a") < col("id_b"))
    })
    t2("fuzzy full")(d =>
      graft.SparkEntry.queries("dedup_fuzzy_verify")(spark, d))

    for (d <- Seq(base, big)) {
      val n = documents(spark, d)
        .select(col("doc_id"), md5(TextOps.normalize(col("text"))).as("k"))
      val groups = n.groupBy("k").agg(count(lit(1)).as("m"))
      val stats = groups.agg(count(lit(1)).as("ngroups"), max(col("m")).as("maxm"),
        sum(col("m") * (col("m") - 1) / 2).as("pairs")).head
      println(s"[flagged] fuzzy groups $d: ngroups=${stats.getLong(0)} " +
        s"max_group=${stats.getLong(1)} pairs=${stats.getAs[Any](2)}")
    }
    spark.stop()
  }
}
