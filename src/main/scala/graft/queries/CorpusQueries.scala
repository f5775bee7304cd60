package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ext.{Dedup, TextOps}

/** Corpus-level training-data preparation operators (round 4): exact
  * substring-duplication measurement (the Lee et al. 2022 "deduplicating
  * training data" shape — per-document fraction of token windows that
  * also occur in another document) and a smoothed bigram language-model
  * scorer (per-document average negative log-likelihood against corpus
  * statistics — the classic cheap LM-quality filter).
  *
  * Scale shapes: both are token-linear — explode → keyed aggregation →
  * keyed join-back. No pairwise work anywhere: window hashes and bigram
  * keys are the shuffle keys, so a hot window/bigram is one reducer key
  * (AQE-splittable), never a cross-document comparison.
  */
object CorpusQueries extends QueryPack {

  /** Duplicated-span window width, in tokens. 8 keeps multi-window docs
    * plentiful at sf0.001 while the fixture's planted near-dup families
    * still share whole spans.
    */
  val DupSpanW = 8

  // Shared DuckDB fragments (mirror TextOps/Dedup exactly — same text as
  // the ExtensionQueries fragments so the families stay in sync).
  private val duckToks = """string_split_regex(lower(text), '\s+')"""
  private def duckH32(x: String) = s"('0x' || substr(md5($x), 1, 8))::BIGINT"

  /** (doc_id, h) with one row per token-window position: per-token md5
    * hashes combined into width-W rolling window hashes by the native
    * one-pass ShingleHashes expression (same Horner scheme the minhash
    * pipeline is proved on; docs shorter than W fall back to their token
    * hashes, exactly like Dedup.shingleHashes).
    */
  private def windowHashes(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), TextOps.hashAll(col("_toks")).as("_th"))
      .select(col("doc_id"),
        explode(Dedup.shingleHashes(col("_th"), DupSpanW)).as("h"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact substring-duplication ratio: a window position counts as
    // duplicated iff its hash occurs in MORE THAN ONE distinct document.
    // (h, doc) pre-aggregation keeps the join-back candidate-sized and is
    // localCheckpoint'd so the corpus tokenizes once, not once per branch
    // (the shingleSets lesson).
    "dup_span_ratio" -> ((s, d) => {
      val whc = windowHashes(s, d)
        .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val nd = whc.groupBy("h").agg(count(lit(1)).as("nd"))
      whc.join(nd, "h")
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_windows"),
          sum(when(col("nd") > 1, col("c")).otherwise(lit(0L))).as("n_dup"))
        .select(col("doc_id"), col("n_windows"), col("n_dup"),
          round(col("n_dup") / col("n_windows"), 6).as("dup_ratio"))
        .orderBy("doc_id")
    }),

    // Smoothed bigram LM score: nll = -avg ln P(b|a) with add-one
    // smoothing, P(b|a) = (c2(a,b)+1) / (c1(a)+V). Corpus statistics are
    // keyed aggregations; V is a 1-row broadcast. Single-token documents
    // have no bigrams and drop out (mirrored by the oracle's inner joins).
    "lm_bigram_score" -> ((s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      // single-token docs are filtered BEFORE sequence(1, n-1): Spark's
      // sequence(1, 0) steps DOWNWARD ([1, 0]), it is not empty
      val bg = tok.where(size(col("_toks")) >= 2)
        .select(col("doc_id"),
          transform(sequence(lit(1), size(col("_toks")) - 1),
            i => struct(element_at(col("_toks"), i).as("a"),
              element_at(col("_toks"), i + 1).as("b"))).as("_bgs"))
        .select(col("doc_id"), explode(col("_bgs")).as("_bg"))
        .select(col("doc_id"), col("_bg.a").as("a"), col("_bg.b").as("b"))
        .localCheckpoint(false)
      val c2 = bg.groupBy("a", "b").agg(count(lit(1)).as("c2"))
      val c1 = bg.groupBy("a").agg(count(lit(1)).as("c1"))
      val v = bg.select(explode(array(col("a"), col("b"))).as("w"))
        .agg(countDistinct(col("w")).as("_v"))
      bg.join(c2, Seq("a", "b")).join(c1, Seq("a")).crossJoin(broadcast(v))
        .select(col("doc_id"),
          -log((col("c2") + 1) / (col("c1") + col("_v"))) as "nllw")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), round(avg(col("nllw")), 6).as("nll"))
        .orderBy("doc_id")
    }))

  def oracleSql: Map[String, String] = {
    val W = DupSpanW
    Map(
      "dup_span_ratio" ->
        s"""WITH th AS (
          |  SELECT doc_id, list_transform($duckToks, tk -> ${duckH32("tk")}) AS th
          |  FROM documents),
          |w AS (
          |  SELECT doc_id, unnest(CASE WHEN len(th) < $W THEN th
          |    ELSE list_transform(generate_series(1, len(th) - ${W - 1}),
          |      i -> list_reduce(th[i:i+${W - 1}],
          |             (a, b) -> (a * ${Dedup.ShingleA} + b) % ${Dedup.MinhashP})) END) AS h
          |  FROM th),
          |whc AS (SELECT doc_id, h, count(*) AS c FROM w GROUP BY doc_id, h),
          |nd AS (SELECT h, count(*) AS nd FROM whc GROUP BY h)
          |SELECT whc.doc_id,
          |  CAST(sum(c) AS BIGINT) AS n_windows,
          |  CAST(sum(CASE WHEN nd.nd > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup,
          |  round(CAST(sum(CASE WHEN nd.nd > 1 THEN c ELSE 0 END) AS DOUBLE)
          |        / sum(c), 6) AS dup_ratio
          |FROM whc JOIN nd ON whc.h = nd.h
          |GROUP BY whc.doc_id ORDER BY whc.doc_id""".stripMargin,

      "lm_bigram_score" ->
        s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
          |bg AS (
          |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
          |    i -> struct_pack(a := toks[i], b := toks[i+1]))) AS bg
          |  FROM tok WHERE len(toks) >= 2),
          |p AS (SELECT doc_id, bg.a AS a, bg.b AS b FROM bg),
          |c2 AS (SELECT a, b, count(*) AS c2 FROM p GROUP BY a, b),
          |c1 AS (SELECT a, count(*) AS c1 FROM p GROUP BY a),
          |v AS (SELECT count(DISTINCT w) AS v
          |      FROM (SELECT unnest([a, b]) AS w FROM p))
          |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          |  round(avg(-ln((c2.c2 + 1) / CAST(c1.c1 + v.v AS DOUBLE))), 6) AS nll
          |FROM p JOIN c2 ON p.a = c2.a AND p.b = c2.b
          |       JOIN c1 ON p.a = c1.a, v
          |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin)
  }
}
