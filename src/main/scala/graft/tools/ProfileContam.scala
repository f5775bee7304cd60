package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.ext.{Dedup, TextOps}

/** Stage dissection of contamination_ratio at the 16× probe corpus (dev
  * tool): the r7 16× sweep measured it 11.7× vs linear bound 16 where 8×
  * measured 2.1 — attribute the growth to a stage before concluding
  * anything. Honest materialization; shuffle-partition count is a CLI
  * knob because the probe scales it with the corpus (128 at 16×) while
  * Time pins 32 — the delta between those configs is itself a suspect.
  */
object ProfileContam {
  def main(args: Array[String]): Unit = {
    val big = args.headOption.getOrElse("/tmp/graft_scale_x16")
    val parts = args.drop(1).headOption.getOrElse("128")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def t(name: String)(mk: => DataFrame): Unit = {
      force(mk) // warm
      val times = Seq.fill(2) {
        val t0 = System.nanoTime(); force(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"[contam] $name%-28s min=${times.min}%.2f s")
    }
    def sh(d: String) = documents(spark, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("_t"))
      .select(col("doc_id"), TextOps.hashAll(col("_t")).as("_th"))
      .select(col("doc_id"), explode(Dedup.shingleHashes(col("_th"))).as("h"))
    t("sh_explode")(sh(big))
    t("holdout_distinct")(sh(big).where(col("doc_id") % 97 === 0)
      .select(col("h")).distinct())
    t("total_agg")(sh(big).where(col("doc_id") % 97 =!= 0)
      .groupBy(col("doc_id")).agg(countDistinct(col("h")).as("n_total")))
    t("shared_semijoin_agg") {
      val s = sh(big)
      s.where(col("doc_id") % 97 =!= 0)
        .join(s.where(col("doc_id") % 97 === 0).select(col("h")).distinct(),
          Seq("h"), "left_semi")
        .groupBy(col("doc_id")).agg(countDistinct(col("h")).as("n_shared"))
    }
    t("full_query")(
      graft.queries.ExtensionQueries.queries("contamination_ratio")(spark, big))
    spark.stop()
  }
}
