package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall-clock at the
  * target scale factor. A prior untimed pass at sf0.001 warms codegen and
  * JIT so the timed numbers reflect steady-state plan execution, not
  * first-compilation overhead (generated code is cached by source, so the
  * small-SF pass warms the large-SF plans).
  *
  * The JSON line is ALSO written to `bench_out.json` (cwd) — sbt wraps
  * stdout in log noise, so the bare file is the parse-reliable record; a
  * consumer should prefer the file when present.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle partitions default to the core count (the driver's sf0.1
    // configuration); SPARK_GRAFT_SHUFFLE_PARTS overrides for scale
    // rehearsals above sf0.1, where partitions must grow with the data
    // (the ScaleProbe lesson: fixed partitions make per-partition hash
    // builds grow linearly with the corpus until they overwhelm the heap).
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }

    // Three timed passes, report the min: absorbs CPU-contention noise on
    // a shared host without changing what is measured (r3's numbers were
    // judged garbage because of a contended run — min-of-3 is the cheapest
    // defense that still times the identical plans).
    // A failed pass must not masquerade as a fast one: timeOnce reports
    // success per pass, and any query with a failing pass is recorded as
    // -1 (sentinel) plus an entry in "errors" — a broken query would
    // otherwise log a small plausible-looking elapsed time.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val passes = Seq.fill(3)(timeOnce(fn))
      val err = passes.flatMap(_._2).headOption
      name -> (if (err.isDefined) -1.0 else passes.map(_._1).min, err)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, (_, Some(e))) =>
      // strip EVERY control char (\p{Cntrl} covers U+0000-U+001F + DEL),
      // not just the whitespace escapes — any raw control byte in an
      // exception message would make the emitted JSON line unparseable
      s"\"" + k + "\":\"" + e.replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200) + "\""
    }.mkString("{", ",", "}")
    val total = results.values.map(_._1).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    TempStores.deleteAll() // lifecycle-query stores: no orphans on exit
  }
}
