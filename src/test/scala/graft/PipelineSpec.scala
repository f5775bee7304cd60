package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries

/** Invariant tests for the round-3 pipeline surface (the oracle harness
  * proves cross-engine equality; these prove the operators' own contracts).
  */
class PipelineSpec extends SparkSpec {
  import PipelineQueries._

  private def run(name: String) = queries(name)(spark, sf0001)

  test("doc_chunks covers every token exactly and overlaps by stride") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(graft.ext.TextOps.tokens(col("text"))).as("n"))
    val chunks = run("doc_chunks")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("tok_sum"),
        max(col("chunk_ix")).as("last_ix"),
        min(col("n_tokens")).as("min_len"),
        max(col("n_tokens")).as("max_len"))
    val joined = chunks.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nChunks, lastIx, n) =
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("last_ix"), r.getAs[Int]("n"))
      assert(nChunks == lastIx + 1) // contiguous chunk indices from 0
      assert(r.getAs[Int]("max_len") <= ChunkSize)
      // Coverage: last chunk's start must reach past the final token.
      assert(lastIx * ChunkStride + ChunkSize >= n)
      // No spurious trailing chunk: the previous start did NOT cover n.
      if (lastIx > 0) assert((lastIx - 1) * ChunkStride + ChunkSize < n)
      // Total tokens emitted = n + overlap double-counting (C-S per
      // non-final chunk, except the tail chunk's actual length).
      val expectedSum = (0L to lastIx).map { i =>
        math.min(ChunkSize, n - i * ChunkStride)
      }.sum
      assert(r.getAs[Long]("tok_sum") == expectedSum)
    }
  }

  test("embed_quantize codes stay in [-127,127] and hit the extremes") {
    val rows = run("embed_quantize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qMin, qMax) = (r.getAs[Long]("q_min"), r.getAs[Long]("q_max"))
      assert(qMin >= -QuantLevels && qMax <= QuantLevels)
      // The max-abs element quantizes to exactly +/-127.
      assert(qMax == QuantLevels || qMin == -QuantLevels)
      assert(r.getAs[Long]("q_norm2") >= QuantLevels.toLong * QuantLevels)
    }
  }

  test("ewma segmented fold == sequential fold after round(6) on fixture") {
    // the scale-safe chunked spelling must reproduce the single
    // collect_list fold AFTER round(6): affine composition reorders the
    // roundings (B accumulates without y, then combines once), so raw
    // doubles may differ in the last ulps — the equality below is a
    // fixture-level check, not a bit-identity law. sf0.001 has ~7
    // events/user (single chunk), so compare on sf0.01 events where ~67
    // events/user spans 3 chunks of 32 and one composition level is live.
    val d = "/root/testdata/sf0.01"
    val got = run("ewma_user_value") // binds sf0001
    val segmented = queries("ewma_user_value")(spark, d).collect().map(_.toSeq)
    val whole = Tables.events(spark, d)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(
        Tables.tsMillis(col("ts")).as("t"), col("event_id").as("e"),
        col("value").as("v")))).as("_ord"))
      .select(col("user_id"), size(col("_ord")).as("n"),
        round(aggregate(
          transform(col("_ord"), x => x("v")),
          lit(null).cast("double"),
          (a, v) => when(a.isNull, v).otherwise(a * 0.5 + v * 0.5)), 6)
          .as("ewma"))
      .orderBy("user_id").collect().map(_.toSeq)
    assert(got.count() > 0)
    assert(segmented.toSeq == whole.toSeq,
      "segmented EWMA diverged from the sequential fold")
  }

  test("ewma recursive segmentation folds one giant key with bounded buffers") {
    // One user, 100k ordered events: level 0 makes 3125 chunk summaries,
    // the composition levels collapse them 98 -> 4 -> 1 (levels 4-5 idle
    // no-ops) — every aggregation buffer holds <= EwmaChunk structs, so
    // the query must complete without any O(n)-per-key collect_list (the
    // r4 "second segmentation level" residual). The value check compares
    // against a driver-side sequential fold within the composition's
    // rounding-reorder tolerance.
    val n = 100000L
    val dir = graft.TempStores.newStorePath("ewma_giant").toString
    spark.range(n).select(
      lit(1).as("user_id"),
      expr("timestamp_micros(1700000000000000 + id * 1000000)").as("ts"),
      col("id").as("event_id"),
      (pmod(col("id") * 2654435761L, lit(1000L)).cast("double") / 10.0).as("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = PipelineQueries.queries("ewma_user_value")(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Int]("n") == n.toInt)
    val vals = (0L until n).map(id => math.floorMod(id * 2654435761L, 1000L).toDouble / 10.0)
    val seq = vals.tail.foldLeft(vals.head)((a, v) => a * 0.5 + v * 0.5)
    assert(math.abs(rows(0).getAs[Double]("ewma") - seq) <= 2e-6,
      s"giant-key EWMA ${rows(0).getAs[Double]("ewma")} vs sequential $seq")
  }

  test("ewma fold fails loudly past the per-key capacity ceiling") {
    // capacity = chunk^(levels+1); with chunk=2, levels=1 that is 4
    // events per key. 4 events must fold to one exact row; 5 events must
    // raise (not silently emit multiple partial rows per key — the
    // failure mode the guard exists to prevent).
    import spark.implicits._
    def prepared(n: Int) = (0 until n).map(i =>
        (1L, i.toLong, i.toLong, i.toDouble)).toDF("user_id", "t", "e", "v")
    val ok = PipelineQueries.ewmaFold(prepared(4), chunk = 2, levels = 1).collect()
    assert(ok.length == 1 && ok(0).getAs[Int]("n") == 4)
    val seq = (1 until 4).foldLeft(0.0)((a, v) => a * 0.5 + v * 0.5)
    assert(math.abs(ok(0).getAs[Double]("ewma") - seq) < 1e-9)
    val e = intercept[Exception] {
      PipelineQueries.ewmaFold(prepared(5), chunk = 2, levels = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("exceeds the batch-fold capacity")),
      s"expected capacity error, got: ${messages(e).mkString(" | ")}")
  }

  test("session_window_native partitions all events; gaps within < 30m") {
    val total = graft.Tables.events(spark, sf0001).count()
    val sessions = run("session_window_native")
    assert(sessions.agg(sum("n_events")).head.getLong(0) == total)
    // Session windows per user never overlap: next start >= previous end.
    val overlap = sessions
      .withColumn("prev_end", lag("session_end_ms", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("session_start_ms")))
      .where(col("prev_end").isNotNull && col("session_start_ms") < col("prev_end"))
    assert(overlap.isEmpty)
  }

  test("vocab_nucleus covers >= 90% of token mass with <= full vocabulary") {
    run("vocab_nucleus").collect().foreach { r =>
      assert(r.getAs[Double]("coverage") >= 0.9)
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("total_tokens"))
    }
  }

  test("dsir weights separate the target slice from the rest of the corpus") {
    // Semantics, not just arithmetic (the oracle pins that): the mean
    // per-feature importance of target-language docs must exceed the
    // non-target mean — the importance ratio is BUILT from the en/corpus
    // contrast, so a sign flip or swapped numerator shows here.
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"))
    val w = run("corpus_dsir_weights").join(docs, Seq("doc_id"))
      .select(col("lang"),
        (col("dsir_micro").cast("double") / col("n_feats")).as("pf"))
      .groupBy(col("lang") === "en").agg(avg(col("pf")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // Target mean sits near zero (smoothing bias can pull it slightly
    // negative — en features also dominate the raw-corpus denominator);
    // the non-target mean must be MATERIALLY below it.
    assert(w(true) > w(false) + 10000.0,
      s"target mean ${w(true)} should exceed non-target ${w(false)} by >0.01")
    assert(w(false) < 0)
  }

  test("semdedup pairs only within cells, all above the cosine floor") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val cells = math.max(SemCellsMin, (emb.count() / SemCellPop).toInt)
    val assign = graft.ext.Similarity.ivfAssignTwoLevel(
      emb, "vec_id", "embedding", cells)
      .select(col("vec_id"), col("cell"))
    val pairs = run("semdedup_pairs")
    assert(pairs.where(col("cos_sim") < SemMinCos).isEmpty)
    val misCell = pairs
      .join(assign.withColumnRenamed("vec_id", "id_a")
        .withColumnRenamed("cell", "cell_a"), "id_a")
      .where(col("cell") =!= col("cell_a"))
    assert(misCell.isEmpty)
  }
}
