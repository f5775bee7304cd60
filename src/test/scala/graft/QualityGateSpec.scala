package graft

import org.apache.spark.sql.functions._
import graft.stream.QualityGate

/** Streaming quality gate: the percolation contract (streamed ==
  * batch-frame scores, bit-identical), plus cross-checks against the
  * batch cleaning pipeline the frozen stats came from.
  */
class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lm = QualityGate.freeze(spark, sf0001)
  private lazy val thr = QualityGate.freezeThresholds(spark, sf0001)
  private lazy val docs = Tables.documents(spark, sf0001)
    .select($"doc_id", $"lang", $"text")

  private def key(r: org.apache.spark.sql.Row): (Long, Seq[Any]) =
    r.getAs[Long]("doc_id") -> r.toSeq.drop(1)

  test("a streamed document gates bit-identically to the batch frame") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sample = docs.as[(Long, String, String)].collect().take(60)
    val input = MemoryStream[(Long, String, String)](spark)
    val q = QualityGate.gate(
        input.toDF().toDF("doc_id", "lang", "text"), lm, thr)
      .writeStream.outputMode("append")
      .format("memory").queryName("gated").start()
    try {
      input.addData(sample.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("gated").collect().map(key(_)).toMap
    val batch = QualityGate.gate(docs, lm, thr).collect().map(key(_)).toMap
    assert(streamed.keySet == sample.map(_._1).toSet)
    streamed.foreach { case (id, v) => assert(batch(id) == v, s"doc $id") }
  }

  test("per-row Gopher metrics equal the batch shuffle-aggregated ones") {
    val cols = Seq("n_words", "mean_word_len", "alpha_frac", "top2_frac",
      "top3_frac", "top4_frac", "dup5_frac")
    val batch = graft.queries.CorpusQueries.gopherMetrics(spark, sf0001)
      .select(col("doc_id") +: cols.map(col) :+ col("keep").as("gk"): _*)
      .collect().map(key(_)).toMap
    val gated = QualityGate.gate(docs, lm, thr)
      .select(col("doc_id") +: cols.map(col) :+ col("gopher_keep"): _*)
      .collect().map(key(_)).toMap
    assert(gated.keySet == batch.keySet)
    gated.foreach { case (id, v) => assert(batch(id) == v, s"doc $id") }
  }

  test("frozen-model NLL equals the batch LM score") {
    val batch = graft.queries.CorpusQueries.queries("lm_bigram_score")(
        spark, sf0001)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val gated = QualityGate.gate(docs, lm, thr)
      .where($"n_bigrams" > 0)
      .select($"doc_id", $"n_bigrams", $"nll")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gated.keySet == batch.keySet)
    gated.foreach { case (id, v) => assert(batch(id) == v, s"doc $id") }
  }

  test("unseen bigrams take the smoothing fallback, not a null score") {
    val novel = Seq((900001L, "en",
      "zzqx unseenword anotherunseen zzqx unseenword mixture"))
      .toDF("doc_id", "lang", "text")
    val r = QualityGate.gate(novel, lm, thr).select($"nll").head()
    assert(!r.isNullAt(0) && r.getDouble(0) > 0.0)
  }

  test("the admission threshold reproduces the batch rank cut off-ties") {
    // threshold = max admitted NLL per lang: every batch-kept doc must
    // pass, and a rejected doc may only pass if it TIES the cut value
    val cut = graft.queries.CorpusQueries.pplRanked(spark, sf0001)
      .select($"doc_id", $"lang", $"nll", $"keep")
      .as[(Long, String, Double, Boolean)].collect()
    val gated = QualityGate.gate(docs, lm, thr)
      .where($"n_bigrams" > 0).select($"doc_id", $"lm_keep")
      .as[(Long, Boolean)].collect().toMap
    cut.foreach { case (id, lang, nll, kept) =>
      if (kept) assert(gated(id), s"batch-kept doc $id fails the threshold")
      else if (gated(id))
        assert(nll == thr(lang), s"rejected doc $id passed off the tie")
    }
  }
}
