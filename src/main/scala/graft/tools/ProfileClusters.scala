package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: why does dedup_clusters slow 3× at 16× when it runs AFTER
  * dedup_minhash_pairs in one JVM? Times each stage with/without the
  * predecessor's cache state. Not part of the driver contract.
  */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_x16")
    val warm = args.lift(1).contains("warm")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    // JIT/codegen warm-up, as ScaleProbe does
    graft.SparkEntry.queries("dedup_clusters")(spark, "/root/testdata/sf0.001").count()
    if (warm) {
      t("0a predecessor minhash_pairs @base")(
        graft.SparkEntry.queries("dedup_minhash_pairs")(spark, "/root/testdata/sf0.1").count())
      t("0b predecessor minhash_pairs @16x")(
        graft.SparkEntry.queries("dedup_minhash_pairs")(spark, dir).count())
      t("0c clusters @base")(
        graft.SparkEntry.queries("dedup_clusters")(spark, "/root/testdata/sf0.1").count())
    }
    t("1 dedup_clusters full")(
      graft.SparkEntry.queries("dedup_clusters")(spark, dir).count())
    t("2 dedup_clusters again")(
      graft.SparkEntry.queries("dedup_clusters")(spark, dir).count())
    spark.stop()
  }
}
