package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graftbridge.CoreBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query SCHEDULING audit (r13): wall seconds next to the number of
  * Spark jobs, stages and tasks the query launches and the summed task
  * run time. At the bench's sf0.1 the fixture is ~15 MB, so a query's
  * wall clock is usually NOT compute: a query that launches 40 jobs
  * (eager localCheckpoints, broadcast collects, store writes) pays ~40
  * fixed scheduling/collection latencies. wall >> task_sec flags
  * scheduling-bound queries (fix: fewer jobs/stages); wall ≈ task_sec /
  * cores flags compute-bound ones (fix: cheaper operators).
  *
  * Usage: runMain graft.tools.JobAudit [queryName...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object JobAudit {

  private final class Acc extends SparkListener {
    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val taskMs = new AtomicLong
    val shufWrite = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        tasks.incrementAndGet()
        taskMs.addAndGet(m.executorRunTime)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    // one warm pass of the whole list (codegen + JIT), then the audited pass
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    val rows = names.map { name =>
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sfDir).count()
      finally {
        CoreBridge.waitListeners(spark.sparkContext)
        spark.sparkContext.removeSparkListener(acc)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val taskSec = acc.taskMs.get / 1e3
      println(f"""{"query":"$name","sec":$sec%.2f,"jobs":${acc.jobs.get},"stages":${acc.stages.get},"tasks":${acc.tasks.get},"task_sec":$taskSec%.2f,"shuffle_write_mb":${acc.shufWrite.get / 1048576.0}%.1f}""")
      (name, sec, acc.jobs.get, acc.stages.get, taskSec)
    }
    println("\nMost jobs:")
    rows.sortBy(-_._3).take(20).foreach { case (n, s, j, st, ts) =>
      println(f"  $n%-30s jobs=$j%3d stages=$st%3d wall=$s%6.2f task_sec=$ts%7.2f")
    }
    spark.stop()
    graft.TempStores.deleteAll()
  }
}
