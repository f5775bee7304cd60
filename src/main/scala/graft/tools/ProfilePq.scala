package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Dev harness isolating the stage costs of sim_pq_adc_topk (slowest
  * catalog query in the r7 bench at 2.7 s where sim_pq_codes is 0.34 s on
  * the same encode work — something downstream of the encode dominates).
  * Each stage materializes via count() after a warm pass.
  */
object ProfilePq {
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
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.embeddings(spark, d)
    def t(name: String)(thunk: => Long): Unit = {
      thunk // warm
      val times = Seq.fill(3) {
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      println(f"[pq] $name%-24s min=${times.min}%.3f s")
    }
    val enc = Similarity.pqEncode(e, "vec_id", "embedding", 8, 16, 64)
    t("encode")(enc.count())
    val ex = enc.select(col("vec_id"), posexplode(col("codes")).as(Seq("j", "code")))
    t("encode+explode")(ex.count())
    t("full_adc") {
      Similarity.pqAdcTopK(e, "vec_id", "embedding", 0L, 8, 16, 64, 10).count()
    }
    spark.stop()
  }
}
