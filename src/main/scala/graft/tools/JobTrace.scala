package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-STAGE attribution for one query (r13 drill): every stage the
  * query runs, keyed by the stage's call-site name (e.g.
  * "localCheckpoint at Graph.scala:152"), with run count, summed task
  * time and shuffle bytes — the "which line of the operator costs what"
  * view JobAudit's per-query totals can't give. Dev probe, not driver
  * contract.
  *
  * Usage: runMain graft.tools.JobTrace <query> [query...]
  */
object JobTrace {
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
    spark.sparkContext.setLogLevel("ERROR")

    final class Tracer extends SparkListener {
      case class S(var n: Int = 0, var taskMs: Long = 0L, var tasks: Int = 0,
        var shufWr: Long = 0L, var shufRd: Long = 0L)
      val byName = new scala.collection.mutable.LinkedHashMap[String, S]
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        byName.synchronized {
          val s = byName.getOrElseUpdate(sc.stageInfo.name, S())
          s.n += 1
          s.tasks += sc.stageInfo.numTasks
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            s.taskMs += m.executorRunTime
            s.shufWr += m.shuffleWriteMetrics.bytesWritten
            s.shufRd += m.shuffleReadMetrics.totalBytesRead
          }
        }
    }

    for (q <- args) {
      try graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      val tr = new Tracer
      spark.sparkContext.addSparkListener(tr)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, d).count()
      org.apache.spark.graftbridge.CoreBridge.waitListeners(spark.sparkContext)
      spark.sparkContext.removeSparkListener(tr)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"==== $q  wall=$wall%.2f s ====")
      tr.byName.toSeq.sortBy(-_._2.taskMs).foreach { case (name, s) =>
        println(f"  x${s.n}%-3d task_sec=${s.taskMs / 1e3}%7.2f tasks=${s.tasks}%4d shufWr=${s.shufWr / 1048576.0}%6.1fMB shufRd=${s.shufRd / 1048576.0}%6.1fMB  $name")
      }
    }
    spark.stop()
    graft.TempStores.deleteAll()
  }
}
