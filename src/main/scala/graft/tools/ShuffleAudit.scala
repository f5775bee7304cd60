package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graftbridge.CoreBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query data-movement audit: run each catalog query and account the
  * bytes that actually moved — shuffle written, shuffle read,
  * memory/disk spill, and instrumented reads — via a task-metrics
  * listener. This is the measured form of the 100-TB argument: a query
  * whose shuffle volume is small relative to its data is shuffling
  * keys/sketches, not the corpus; one that shuffles everything (or
  * spills) is moving the data and needs a justification.
  *
  * Metric semantics (measured on this platform, r8): SHUFFLE and SPILL
  * task metrics are authoritative. `input_mb` is NOT a parquet-scan
  * gauge here — the local-fs vectorized parquet reader reports 0 bytes
  * through `inputMetrics` (the Hadoop-statistics thread-local misses
  * it), while CACHED-BLOCK reads (localCheckpoint pins) DO count. So a
  * large `input_mb` flags heavy cache re-read traffic (e.g.
  * graph_pagerank re-reading its pinned edge frame once per iteration —
  * the documented iterative design), and `shuffle_to_input` is
  * indicative only.
  *
  * r8 full-catalog result at sf0.1 (179 queries): total shuffle write
  * 226.9 MB, ZERO spill anywhere, max single query 30.3 MB
  * (math_funcs — the deterministic final ORDER BY range-shuffling the
  * full projected result, an output-contract artifact), max
  * read/write amplification 3.8× (multi-consumer exchange reuse).
  *
  * Usage: runMain graft.tools.ShuffleAudit [queryName...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
  *      SPARK_GRAFT_CPUS (default 8).
  */
object ShuffleAudit {

  private final class Acc extends SparkListener {
    val input = new AtomicLong
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val tasks = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        tasks.incrementAndGet()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val mb = 1024.0 * 1024.0
    def r2(x: Double) = math.rint(x * 100) / 100

    val rows = names.map { name =>
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sfDir).foreach(_ => ())
      finally {
        CoreBridge.waitListeners(spark.sparkContext)
        spark.sparkContext.removeSparkListener(acc)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val in = acc.input.get / mb
      val sw = acc.shufWrite.get / mb
      val sr = acc.shufRead.get / mb
      val sp = (acc.memSpill.get + acc.diskSpill.get) / mb
      val ratio = if (acc.input.get > 0) sw / in else 0.0
      println(s"""{"query":"$name","input_mb":${r2(in)},"shuffle_write_mb":${r2(sw)},""" +
        s""""shuffle_read_mb":${r2(sr)},"spill_mb":${r2(sp)},""" +
        s""""shuffle_to_input":${r2(ratio)},"tasks":${acc.tasks.get},"sec":${r2(sec)}}""")
      (name, in, sw, ratio, sp)
    }

    val totIn = rows.map(_._2).sum
    val totSw = rows.map(_._3).sum
    println(f"%nTOTAL input ${totIn}%.1f MB, shuffle write ${totSw}%.1f MB, " +
      f"catalog shuffle/input ${totSw / math.max(totIn, 1e-9)}%.3f")
    println("\nShuffle-heaviest (MB written | x input):")
    rows.sortBy(-_._3).take(15).foreach { case (n, in, sw, ra, sp) =>
      println(f"  $n%-28s ${sw}%9.1f | ${ra}%5.2fx  (input ${in}%.1f, spill ${sp}%.1f)")
    }
    spark.stop()
  }
}
