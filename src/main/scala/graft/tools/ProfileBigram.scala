package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ext.TextOps

/** Dev profiling harness for the bigram-LM plan stages (not part of the
  * driver contract): isolates tokenization, bigram explode, the corpus
  * aggregations, and the stream-side join to show where lm_bigram_score's
  * wall-clock goes.
  */
object ProfileBigram {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = documents(spark, d)
    docs.count()
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val tok = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      time("tokens only")(tok.select(sum(size(col("_toks")))).head())
      val bg = tok.where(size(col("_toks")) >= 2)
        .select(col("doc_id"),
          transform(sequence(lit(1), size(col("_toks")) - 1),
            i => struct(element_at(col("_toks"), i).as("a"),
              element_at(col("_toks"), i + 1).as("b"))).as("_bgs"))
        .select(col("doc_id"), explode(col("_bgs")).as("_bg"))
        .select(col("doc_id"), col("_bg.a").as("a"), col("_bg.b").as("b"))
      time("bigram explode count")(println("occ=" + bg.count()))
      val bgZip = tok.where(size(col("_toks")) >= 2)
        .select(col("doc_id"),
          explode(arrays_zip(
            slice(col("_toks"), lit(1), size(col("_toks")) - 1),
            slice(col("_toks"), lit(2), size(col("_toks")) - 1))).as("_bg"))
        .select(col("doc_id"), col("_bg")("0").as("a"), col("_bg")("1").as("b"))
      time("bigram zip-slice count")(println("occz=" + bgZip.count()))
      time("c2 agg (zip-slice)")(println("c2z=" + bgZip.groupBy("a", "b").count().count()))
      time("c2 agg")(println("c2=" + bg.groupBy("a", "b").count().count()))
      val bgCk = bg.localCheckpoint(false)
      time("localCheckpoint materialize")(println("ck=" + bgCk.count()))
      time("full query")(println("rows=" +
        graft.queries.CorpusQueries.queries("lm_bigram_score")(spark, d).count()))
    }
    spark.stop()
  }
}
