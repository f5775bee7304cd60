package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic per-query timer (dev tool): warms each named query at sf0.001,
  * then prints min-of-3 wall-clock at the target SF — the same protocol as
  * graft.Bench, for one query at a time.
  */
object Time {
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
    for (q <- args) {
      val fn = graft.SparkEntry.queries(q)
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"[time] $q warmup failed: $e") }
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        fn(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $q%-28s min=${times.min}%.2f s  (passes: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
