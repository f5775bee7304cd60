package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ext.{Dedup, Drift, QualityModel, SuffixOps, TextOps, Unigram}

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

  /** Mojibake detectors (literal BMP code points — Java regex and
    * DuckDB's RE2 agree on literal/class semantics there) and the
    * deterministic damage string planted on doc_id % 4 == 0:
    * " café" with the é as the UTF-8-as-Latin-1 digraph Ã© (U+00C3
    * U+00A9), then U+FFFD (decoder replacement) and U+0085 (C1 NEL).
    */
  /** Band width (in nats of avg-NLL) for the banded per-lang perplexity
    * ranking: 1/16 nat splits the fixture's ~2-nat nll spread into ~30
    * bands per language and a 100 TB corpus's into the same \u2014 parallelism
    * scales with (languages \u00D7 bands) while each task sorts one band.
    */
  val PplRankBandWidth = 0.0625

  val MojiReplPat = "\uFFFD"
  val MojiC1Pat = "[\u0080-\u009F]"
  val MojiLatin1Pat = "\u00C3[\u0080-\u00BF]"
  val MojiPlant = " caf\u00C3\u00A9 \uFFFD\u0085"

  /** PMI collocations: pairs below this bigram count are noise (the
    * standard floor), and the emitted association list is top-K by
    * (pmi, pair) — deterministic total order, so LIMIT cuts identically
    * on both engines.
    */
  val PmiMinCount = 5
  val PmiTopK = 200

  /** Winnowing (Schleimer/Wilkerson/Aiken, MOSS): k-gram size, window
    * width (guarantee threshold t = k + w − 1 = 8 tokens), the
    * stop-fingerprint document-frequency cap, and the shared-fingerprint
    * floor for reporting a match pair.
    */
  val WinnowK = 5
  val WinnowW = 4
  val WinnowFreqCap = 8
  val WinnowMinShared = 2

  /** Length-bucket ladder for pad_efficiency: powers of two from the
    * min batchable length to the truncation cap. The bucket CASE is
    * generated ONCE as SQL text and evaluated verbatim by both engines
    * (the zorder pattern) — no float log2 near power-of-two boundaries.
    */
  private val PadLadder: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024,
    2048, 4096)

  /** RAKE: max candidate-phrase length (tokens) and result list size. */
  private val RakeMaxLen = 4
  private val RakeTopK = 100
  private val padBucketSql: String =
    PadLadder.init.map(b => s"WHEN nt <= $b THEN $b").mkString(
      "CASE ", " ", s" ELSE ${PadLadder.last} END")

  /** Rightmost-min encoding base: fingerprint hashes are < MinhashP <
    * 2^31, so `h·B + (B−1−pos)` packs (hash asc, position desc) into one
    * ordered long — min() over the sliding window IS the winnowing rule
    * "smallest hash, rightmost on ties" with no per-frame conditional.
    */
  private val WinnowB = 2147483648L // 2^31

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

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ extraQueries

  private val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact substring-duplication ratio: a window position counts as
    // duplicated iff its hash occurs in MORE THAN ONE distinct document.
    // After the (h, doc) pre-aggregation, nd(h) is a whole-partition
    // count over a Window.partitionBy(h) — ONE pass, no self-join, no
    // checkpoint. (The earlier agg + join-back spelling needed a
    // localCheckpoint to share the pre-agg across branches; checkpointed
    // blocks are never unpersisted, and at the 16× probe scale the
    // accumulated storage pressure made the query superlinear.) h is a
    // rolling hash — high-cardinality, so the window partitions are
    // tiny and skew-free at any corpus size.
    "dup_span_ratio" -> ((s, d) => {
      val whc = windowHashes(s, d)
        .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      val byH = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      whc.withColumn("nd", count(lit(1)).over(byH))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_windows"),
          sum(when(col("nd") > 1, col("c")).otherwise(lit(0L))).as("n_dup"))
        .select(col("doc_id"), col("n_windows"), col("n_dup"),
          round(col("n_dup") / col("n_windows"), 6).as("dup_ratio"))
        .orderBy("doc_id")
    }),

    // Exact substring-duplication REMOVAL — the write-path half of
    // dup_span_ratio (Lee et al.'s dedup REWRITES the corpus, it doesn't
    // just measure it): every token covered by a window whose hash occurs
    // in more than one distinct document is stripped, and the survivors
    // are reassembled in document order. Same token-linear shapes as the
    // ratio: the window hash h is the only corpus-wide shuffle key
    // (high-cardinality, skew-free); coverage expansion is a constant ×W
    // explode; the per-doc reconstruction list is bounded by document
    // length — inherent to emitting a text column, same bound as
    // pack_sequences/doc_chunks.
    "dup_span_strip" -> ((s, d) => {
      val W = DupSpanW
      val tok = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      val base = tok.select(col("doc_id"), size(col("_toks")).as("n_tokens"))
      val wh = tok
        .select(col("doc_id"), TextOps.hashAll(col("_toks")).as("_th"))
        .select(col("doc_id"),
          when(size(col("_th")) < W, lit(1)).otherwise(lit(W)).as("effw"),
          posexplode(Dedup.shingleHashes(col("_th"), W)).as(Seq("p0", "h")))
        .select(col("doc_id"), col("effw"), (col("p0") + 1).as("pos"), col("h"))
      // Hashes present in >1 distinct doc — the dup_span_ratio spelling
      // (whole-partition count over tiny per-h groups, no self-join).
      val byH = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      val dupH = wh.select("h", "doc_id").distinct()
        .withColumn("ndoc", count(lit(1)).over(byH))
        .where(col("ndoc") > 1).select("h").distinct()
      val removed = wh.join(dupH, Seq("h"), "left_semi")
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + col("effw") - 1)).as("tpos"))
        .distinct()
      val kept = tok
        .select(col("doc_id"), posexplode(col("_toks")).as(Seq("t0", "tk")))
        .select(col("doc_id"), (col("t0") + 1).as("tpos"), col("tk"))
        .join(removed, Seq("doc_id", "tpos"), "left_anti")
      val rec = kept.groupBy("doc_id")
        .agg(count(lit(1)).as("_n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("tpos"), col("tk")))),
            x => x.getField("tk")), " ").as("_clean"))
      base.join(rec, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          coalesce(col("_n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("_clean"), lit("")).as("clean_text"))
        .orderBy("doc_id")
    }),

    // Smoothed bigram LM score: nll = -avg ln P(b|a) with add-one
    // smoothing, P(b|a) = (c2(a,b)+1) / (c1(a)+V). Corpus statistics are
    // keyed aggregations; V is a 1-row broadcast. Single-token documents
    // have no bigrams and drop out (mirrored by the oracle's inner joins).
    "lm_bigram_score" -> ((s, d) => lmScores(s, d).orderBy("doc_id")),

    // Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    // Goodman 1999's interpolated form, one absolute discount D=0.75):
    // P(b|a) = max(c(a,b)−D, 0)/c(a·) + D·N1+(a·)/c(a·) · N1+(·b)/T —
    // the continuation-count smoothing that beats add-one/Jelinek-Mercer
    // because a word's unigram weight is HOW MANY CONTEXTS it follows,
    // not how often it occurs ("San Francisco" inflates c(francisco) but
    // not its continuation count). The canonical perplexity filter's
    // smoothing, one order up from lm_bigram_score. Same optimized plan:
    // every statistic (c2, c1, left-continuation N1+(a·) = distinct
    // successors, right-continuation N1+(·b) = distinct predecessors,
    // type total T) derives from the ONE bigram-type table; the per-type
    // NLL is assembled vocabulary-side with the expression tree spelled
    // identically in both engines, and the corpus-sized stream meets
    // exactly one scored join. Single-token docs drop (no bigrams).
    "lm_kneser_ney" -> ((s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      val n1 = size(col("_toks")) - 1
      val bg = tok.where(size(col("_toks")) >= 2)
        .select(col("doc_id"),
          explode(arrays_zip(
            slice(col("_toks"), lit(1), n1),
            slice(col("_toks"), lit(2), n1))).as("_bg"))
        .select(col("doc_id"), col("_bg")("0").as("a"), col("_bg")("1").as("b"))
      val c2 = bg.groupBy("a", "b").agg(count(lit(1)).as("c2"))
        .localCheckpoint(false) // vocabulary-sized; cuts stats branches loose
      val c1 = c2.groupBy("a")
        .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1p"))
      val ctn = c2.groupBy("b").agg(count(lit(1)).as("nl"))
      val tt = c2.agg(count(lit(1)).as("nt"))
      val p = c2.join(c1, Seq("a")).join(ctn, Seq("b"))
        .crossJoin(broadcast(tt))
        .select(col("a"), col("b"),
          (-log(
            greatest(col("c2").cast("double") - lit(KnDiscount), lit(0.0))
              / col("c1")
              + lit(KnDiscount) * col("n1p") / col("c1")
              * (col("nl").cast("double") / col("nt")))).as("nllw"))
      bg.join(p, Seq("a", "b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(col("nllw")), 6).as("nll_kn"))
        .orderBy("doc_id")
    }),

    // MODIFIED Kneser-Ney trigram LM (Chen & Goodman 1998 §2.7) — the
    // smoothing production LMs actually ship: per-order discount
    // TRIPLES D1/D2/D3+ (one per count class, estimated from the
    // count-of-counts via Y = n1/(n1+2n2), Dk = k − (k+1)·Y·n(k+1)/nk)
    // instead of lm_kneser_ney's single D, recursing trigram → bigram
    // CONTINUATION counts → unigram continuation. Every statistic
    // derives from the ONE checkpointed trigram-type table: c(ab·) and
    // the per-context count-class histogram by (a,b); the bigram level
    // from cc(b,c) = |{a : c(abc)>0}| (continuation, not raw, counts —
    // the Kneser-Ney insight) with ITS OWN discount triple from cc's
    // count-of-counts; the unigram level from distinct-(b,c) rows.
    // Count-of-count totals ride as 1-row broadcasts; discount ratios
    // are nullif-guarded and clamped to [0, k] so a degenerate corpus
    // (empty count class) degrades instead of NULLing the score; the
    // corpus-sized trigram stream meets exactly one scored join. Docs
    // under 3 tokens drop (no trigrams). The float expression tree is
    // spelled identically in both engines behind round(·, 6).
    "lm_kneser_ney_tri" -> ((s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      val n3 = size(col("_toks")) - 2
      val tri = tok.where(size(col("_toks")) >= 3)
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("_toks"), lit(1), n3),
          slice(col("_toks"), lit(2), n3),
          slice(col("_toks"), lit(3), n3))).as("_t"))
        .select(col("doc_id"), col("_t")("0").as("a"),
          col("_t")("1").as("b"), col("_t")("2").as("c"))
      def cls(cnt: Column): Seq[org.apache.spark.sql.Column] = Seq(
        sum(when(cnt === 1, 1L).otherwise(0L)),
        sum(when(cnt === 2, 1L).otherwise(0L)),
        sum(when(cnt >= 3, 1L).otherwise(0L)),
        sum(when(cnt === 3, 1L).otherwise(0L)),
        sum(when(cnt === 4, 1L).otherwise(0L)))
      val c3 = tri.groupBy("a", "b", "c").agg(count(lit(1)).as("c3"))
        .localCheckpoint(false) // type-sized; every statistic derives here
      val hi = c3.groupBy("a", "b").agg(sum(col("c3")).as("cab"),
        cls(col("c3"))(0).as("h1"), cls(col("c3"))(1).as("h2"),
        cls(col("c3"))(2).as("h3"))
      val coc3 = c3.agg(cls(col("c3"))(0).as("n1"), cls(col("c3"))(1).as("n2"),
        cls(col("c3"))(3).as("n3"), cls(col("c3"))(4).as("n4"))
      val cc2 = c3.groupBy("b", "c").agg(count(lit(1)).as("cc"))
        .localCheckpoint(false) // bigram continuation-count table
      val mid = cc2.groupBy("b").agg(sum(col("cc")).as("cb"),
        cls(col("cc"))(0).as("k1"), cls(col("cc"))(1).as("k2"),
        cls(col("cc"))(2).as("k3"))
      val coc2 = cc2.agg(cls(col("cc"))(0).as("m1"), cls(col("cc"))(1).as("m2"),
        cls(col("cc"))(3).as("m3"), cls(col("cc"))(4).as("m4"))
      val cu = cc2.groupBy("c").agg(count(lit(1)).as("cuc"))
      val nbt = cc2.agg(count(lit(1)).as("nbt"))
      val scored = c3.join(hi, Seq("a", "b")).join(cc2, Seq("b", "c"))
        .join(mid, Seq("b")).join(cu, Seq("c"))
        .crossJoin(broadcast(coc3)).crossJoin(broadcast(coc2))
        .crossJoin(broadcast(nbt))
        .withColumn("y3",
          expr("coalesce(CAST(n1 AS DOUBLE) / nullif(n1 + 2 * n2, 0), 0.5)"))
        .withColumn("d1", expr("greatest(0.0, least(1.0," +
          " 1.0 - 2.0 * y3 * coalesce(CAST(n2 AS DOUBLE) / nullif(n1, 0), 0.0)))"))
        .withColumn("d2", expr("greatest(0.0, least(2.0," +
          " 2.0 - 3.0 * y3 * coalesce(CAST(n3 AS DOUBLE) / nullif(n2, 0), 0.0)))"))
        .withColumn("d3", expr("greatest(0.0, least(3.0," +
          " 3.0 - 4.0 * y3 * coalesce(CAST(n4 AS DOUBLE) / nullif(n3, 0), 0.0)))"))
        .withColumn("y2",
          expr("coalesce(CAST(m1 AS DOUBLE) / nullif(m1 + 2 * m2, 0), 0.5)"))
        .withColumn("e1", expr("greatest(0.0, least(1.0," +
          " 1.0 - 2.0 * y2 * coalesce(CAST(m2 AS DOUBLE) / nullif(m1, 0), 0.0)))"))
        .withColumn("e2", expr("greatest(0.0, least(2.0," +
          " 2.0 - 3.0 * y2 * coalesce(CAST(m3 AS DOUBLE) / nullif(m2, 0), 0.0)))"))
        .withColumn("e3", expr("greatest(0.0, least(3.0," +
          " 3.0 - 4.0 * y2 * coalesce(CAST(m4 AS DOUBLE) / nullif(m3, 0), 0.0)))"))
        .withColumn("p1", expr("CAST(cuc AS DOUBLE) / nbt"))
        .withColumn("p2", expr(
          "greatest(CAST(cc AS DOUBLE) - (CASE WHEN cc = 1 THEN e1" +
            " WHEN cc = 2 THEN e2 ELSE e3 END), 0.0) / cb" +
            " + (e1 * k1 + e2 * k2 + e3 * k3) / cb * p1"))
        .withColumn("p3", expr(
          "greatest(CAST(c3 AS DOUBLE) - (CASE WHEN c3 = 1 THEN d1" +
            " WHEN c3 = 2 THEN d2 ELSE d3 END), 0.0) / cab" +
            " + (d1 * h1 + d2 * h2 + d3 * h3) / cab * p2"))
        .select(col("a"), col("b"), col("c"), (-log(col("p3"))).as("nllw"))
      tri.join(scored, Seq("a", "b", "c"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_trigrams"),
          round(avg(col("nllw")), 6).as("nll_mkn"))
        .orderBy("doc_id")
    }),

    // Perplexity-gate filter (the CCNet shape: keep the best-scoring
    // fraction of each language under a cheap LM): per-lang lowest-NLL
    // 80% under the smoothed bigram LM. RANK-based, not threshold-based
    // — both engines rank the ROUNDED nll (bit-equal by the lm_bigram
    // recipe) with doc_id tiebreak and take rn·5 ≤ n·4 by integer
    // cross-multiplication, so the cut is exact; a float percentile
    // threshold could flip membership within an ulp of the cut. Plan:
    // lmScores' one scored stream join + a lang projection join + the
    // BANDED per-lang rank (ops/BandedRank): the fractional cut needs the
    // full ranking (no TopKPerKey escape), and lang is a handful of
    // values whose group size grows with the corpus, so a bare
    // Window.partitionBy(lang) would sort each language's whole
    // doc-score frame on ONE task (the anomaly_zscore rule). Banding on
    // nll/16 keeps (lang × band) parallelism; the per-lang total comes
    // off the same band-counts frame. Sub-2-token docs drop with the LM
    // (no bigrams). Oracle unchanged — bare windows are fine in DuckDB.
    "corpus_ppl_filter" -> ((s, d) => pplRanked(s, d).orderBy("doc_id")),

    // Mojibake / encoding-damage detection — the cleaning pass a crawl
    // corpus runs before tokenization. Three detectors: U+FFFD
    // replacement chars (decoder already gave up), C1 control range
    // U+0080–U+009F (Latin-1-decoded control bytes), and the UTF-8-as-
    // Latin-1 signature Ã followed by a continuation-range char (the
    // "Ã©" class). The fixture is clean ASCII, so damage is PLANTED
    // deterministically on doc_id % 4 == 0 (the pii_scan_redact
    // pattern) — detectors must fire on exactly those docs and the keep
    // flag on the rest. Pure projection, scan-speed at any corpus size.
    "text_mojibake_flags" -> ((s, d) => {
      // NOTE: the plant string is a Scala literal, NOT SQL chr() — Spark's
      // chr is byte-oriented (mod 256) while DuckDB's is code-point; the
      // oracle uses DuckDB chr() to build the identical code points.
      mojiPlantedText(s, d).select(col("doc_id"),
        size(expr(s"regexp_extract_all(text, '$MojiReplPat', 0)"))
          .cast("long").as("n_repl"),
        size(expr(s"regexp_extract_all(text, '$MojiC1Pat', 0)"))
          .cast("long").as("n_c1"),
        size(expr(s"regexp_extract_all(text, '$MojiLatin1Pat', 0)"))
          .cast("long").as("n_mojibake"))
        .withColumn("keep",
          col("n_repl") + col("n_c1") + col("n_mojibake") === 0L)
        .orderBy("doc_id")
    }),

    // Interpolated trigram LM (Jelinek-Mercer): per-doc NLL under
    // P(c|a,b) = 0.6·ML₃ + 0.3·ML₂ + 0.1·ML₁ — the lm_bigram recipe one
    // order up, same optimization: each ML component comes from its own
    // n-gram stream's keyed count (map-side combined), the probability
    // is assembled on the TYPE table (trigram-type-sized, checkpointed —
    // AQE broadcasts it when the vocab fits) with the expression
    // spelled identically in both engines, and the corpus-sized stream
    // meets exactly one scored join. Docs under 3 tokens drop (no
    // trigrams — oracle's inner joins mirror).
    "lm_trigram_score" -> ((s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      val n2 = size(col("_toks")) - 1
      val n3 = size(col("_toks")) - 2
      val tri = tok.where(size(col("_toks")) >= 3)
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("_toks"), lit(1), n3),
          slice(col("_toks"), lit(2), n3),
          slice(col("_toks"), lit(3), n3))).as("_t"))
        .select(col("doc_id"), col("_t")("0").as("a"),
          col("_t")("1").as("b"), col("_t")("2").as("c"))
      val c3 = tri.groupBy("a", "b", "c").agg(count(lit(1)).as("c3"))
        .localCheckpoint(false)
      val c2 = tok.where(size(col("_toks")) >= 2)
        .select(explode(arrays_zip(
          slice(col("_toks"), lit(1), n2),
          slice(col("_toks"), lit(2), n2))).as("_bg"))
        .select(col("_bg")("0").as("x"), col("_bg")("1").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("c2"))
        .localCheckpoint(false)
      val c1 = tok.select(explode(col("_toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
        .localCheckpoint(false)
      val nTot = c1.agg(sum(col("c1")).as("n"))
      val scored = c3
        .join(c2.select(col("x").as("a"), col("y").as("b"),
          col("c2").as("c2ab")), Seq("a", "b"))
        .join(c2.select(col("x").as("b"), col("y").as("c"),
          col("c2").as("c2bc")), Seq("b", "c"))
        .join(c1.select(col("w").as("b"), col("c1").as("c1b")), Seq("b"))
        .join(c1.select(col("w").as("c"), col("c1").as("c1c")), Seq("c"))
        .crossJoin(broadcast(nTot))
        .select(col("a"), col("b"), col("c"),
          expr("0.6 * (c3 * 1.0 / c2ab) + 0.3 * (c2bc * 1.0 / c1b)" +
            " + 0.1 * (c1c * 1.0 / n)").as("p"))
      tri.join(scored, Seq("a", "b", "c"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_trigrams"),
          round(avg(-log(col("p"))), 6).as("nll"))
        .orderBy("doc_id")
    }),

    // PMI collocations: pointwise mutual information of adjacent word
    // pairs, ln((c12/Nb) / ((c1/N)·(c2/N))) in micro-units with the
    // parenthesization spelled IDENTICALLY in both engines (each IEEE
    // division/multiply is bit-equal on equal integer operands; ln ulps
    // sit behind the rounding — the BM25 recipe). Token stream is
    // aggregated twice (unigrams, bigrams — both keyed shuffles with
    // map-side combine); everything after is vocabulary-sized: the
    // unigram/bigram count tables are checkpointed (the lm_bigram c2
    // precedent), totals ride as 1-row broadcasts, and the count floor
    // prunes the pair table before its two vocabulary joins (AQE
    // broadcasts them when the vocab fits, shuffled-hash when not).
    // Top-K by (pmi, pair) is a bounded TakeOrdered, not a full sort.
    "text_pmi_topk" -> ((s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      val uc = tok.select(explode(col("_toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val n1 = size(col("_toks")) - 1
      val pc0 = tok.where(size(col("_toks")) >= 2)
        .select(explode(arrays_zip(
          slice(col("_toks"), lit(1), n1),
          slice(col("_toks"), lit(2), n1))).as("_bg"))
        .select(col("_bg")("0").as("w1"), col("_bg")("1").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .localCheckpoint(false)
      val nTot = uc.agg(sum(col("c")).as("n"))
      val nbTot = pc0.agg(sum(col("c12")).as("nb")) // BEFORE the floor
      pc0.where(col("c12") >= PmiMinCount)
        .join(uc.select(col("w").as("w1"), col("c").as("cu1")), Seq("w1"))
        .join(uc.select(col("w").as("w2"), col("c").as("cu2")), Seq("w2"))
        .crossJoin(broadcast(nTot)).crossJoin(broadcast(nbTot))
        .select(col("w1"), col("w2"), col("c12"),
          round(log((col("c12") * lit(1.0) / col("nb")) /
            ((col("cu1") * lit(1.0) / col("n")) *
              (col("cu2") * lit(1.0) / col("n")))) * 1e6, 0)
            .cast("long").as("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
        .limit(PmiTopK)
    }))

  /** Gopher-rules metric frame (doc_id, n_words, fractions, keep) —
    * shared by `quality_gopher_rules` and the corpus-prep v2 composite.
    * Unordered; callers add their presentation sort.
    */
  private[graft] def gopherMetrics(s: SparkSession, d: String): DataFrame = {
    val staged = documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("nc"),
        TextOps.tokens(col("text")).as("_toks"))
    def gramCounts(n: Int): DataFrame = {
      val ln = greatest(size(col("_toks")) - (n - 1), lit(0))
      staged
        .select(col("doc_id"),
          explode(arrays_zip((1 to n).map(k =>
            slice(col("_toks"), lit(k), ln)): _*)).as("_g"))
        .select(col("doc_id"),
          concat_ws(" ", (0 until n).map(i => col("_g")(i.toString)): _*)
            .as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
    }
    def topChars(n: Int, alias: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("cnt").desc, col("g"))
      gramCounts(n)
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col("doc_id"),
          (col("cnt") * length(col("g")).cast("long")).as(alias))
    }
    val ws = staged
      .select(col("doc_id"), col("nc"), explode(col("_toks")).as("tok"))
      .groupBy(col("doc_id"), col("nc"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("tok")).cast("long")).as("_sl"),
        sum(when(col("tok").rlike("[a-z]"), 1L).otherwise(0L)).as("_na"))
    val dup5 = gramCounts(5).where(col("cnt") > 1)
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * length(col("g")).cast("long")).as("_d5"))
    def frac(x: Column, den: Column): Column =
      round(x.cast("double") / nullif(den, lit(0L)), 6)
    ws
      .join(topChars(2, "_t2"), Seq("doc_id"), "left")
      .join(topChars(3, "_t3"), Seq("doc_id"), "left")
      .join(topChars(4, "_t4"), Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        frac(col("_sl"), col("n_words")).as("mean_word_len"),
        frac(col("_na"), col("n_words")).as("alpha_frac"),
        frac(coalesce(col("_t2"), lit(0L)), col("nc")).as("top2_frac"),
        frac(coalesce(col("_t3"), lit(0L)), col("nc")).as("top3_frac"),
        frac(coalesce(col("_t4"), lit(0L)), col("nc")).as("top4_frac"),
        frac(coalesce(col("_d5"), lit(0L)), col("nc")).as("dup5_frac"))
      .withColumn("keep",
        col("n_words").between(GopherMinWords, GopherMaxWords) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("alpha_frac") >= 0.8 &&
          col("top2_frac") <= 0.2 && col("top3_frac") <= 0.18 &&
          col("top4_frac") <= 0.16 && col("dup5_frac") <= 0.15)
  }

  /** The perplexity-gate rank frame (doc_id, lang, nll, keep) — the
    * banded per-lang CCNet cut behind `corpus_ppl_filter`, shared with
    * the corpus-prep v2 composite. Unordered. Sub-2-token docs have no
    * bigrams, hence no row (a doc the LM cannot score is not kept).
    */
  private[graft] def pplRanked(s: SparkSession, d: String): DataFrame = {
    val scored = lmScores(s, d)
      .join(documents(s, d).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("nll"))
    graft.ops.BandedRank.rank(scored, Seq("lang"), col("nll"),
        col("doc_id"), bandWidth = PplRankBandWidth)
      .select(col("doc_id"), col("lang"), col("nll"),
        (col("_rank") * 5 <= col("_n") * 4).as("keep"))
  }

  /** Documents with the deterministic mojibake damage planted on
    * doc_id % 4 == 0 (see [[MojiPlant]]) — (doc_id, text). Shared by the
    * standalone detector and the corpus-prep v2 hygiene gate.
    */
  private[queries] def mojiPlantedText(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 4 === 0, concat(col("text"), lit(MojiPlant)))
        .otherwise(col("text")).as("text"))

  /** Documents with the deterministic URL plant on doc_id % 5 == 0
    * (21 distinct domains from the doc_id % 7 × % 3 product) —
    * (doc_id, text). Shared by `text_url_domains` and the corpus-prep v2
    * hygiene gate.
    */
  private[queries] def urlPlantedText(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" see https://www"),
          (col("doc_id") % 7).cast("string"), lit(".example"),
          (col("doc_id") % 3).cast("string"), lit(".com/page")))
        .otherwise(col("text")).as("text"))

  /** Per-document smoothed bigram-LM negative log-likelihood —
    * (doc_id, n_bigrams, nll); shared by `lm_bigram_score`, the
    * perplexity gate, and the curriculum-planning composite.
    */
  private[queries] def lmScores(s: SparkSession, d: String): DataFrame = {
      val tok = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      // Adjacent pairs via arrays_zip(slice, slice) — fully codegen'd.
      // The transform(sequence(...), i -> struct(element_at...)) spelling
      // is CodegenFallback (higher-order functions run interpreted) and
      // profiled 11x slower on the exploded stream. slice is 1-based and
      // clamps to the array end; size>=2 filters single-token docs first.
      val n1 = size(col("_toks")) - 1
      val bg = tok.where(size(col("_toks")) >= 2)
        .select(col("doc_id"),
          explode(arrays_zip(
            slice(col("_toks"), lit(1), n1),
            slice(col("_toks"), lit(2), n1))).as("_bg"))
        .select(col("doc_id"), col("_bg")("0").as("a"), col("_bg")("1").as("b"))
      // The token-level stream is aggregated ONCE (c2) and joined ONCE:
      // c1 and V derive from c2 (c1(a) = Σ_b c2(a,b); V's word set = c2's
      // key set), and the per-bigram smoothed NLL is computed on the
      // vocabulary-sized side BEFORE it meets the stream — the naive
      // plan's second big join and two extra stream-wide aggregations
      // were the whole cost. The stream-side join build input is
      // vocabulary-sized, so AQE turns it into a broadcast join when the
      // vocabulary fits and a shuffled hash join when it doesn't.
      // bg is NOT checkpointed: the zip-slice explode is codegen'd and
      // recomputing it for the two consumers costs less than pinning a
      // stream-sized block in storage memory (checkpointed blocks are
      // never unpersisted — the dup_span_ratio 16× lesson). c2 IS
      // checkpointed: vocabulary-sized, and it cuts the c1/V/nll branches
      // loose from the stream.
      val nll = lmNllTable(s, d)
      bg.join(nll, Seq("a", "b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), round(avg(col("nllw")), 6).as("nll"))
  }

  /** The vocabulary-side half of [[lmScores]]: per-bigram count +
    * smoothed NLL `(a, b, c2, nllw)` plus the unigram/vocab stats behind
    * it — also the FROZEN model the streaming quality gate collects
    * ([[graft.stream.QualityGate]]). Returns (nll table, c1 table, V).
    *
    * MEMOIZED per (session, dir, corpus fingerprint): V is a plan-time
    * constant (the `.head()` below runs eager Spark jobs during
    * DataFrame construction), and the LM chain has several catalog
    * consumers (`lm_bigram_score`, `corpus_ppl_filter`, the v2
    * composite's gate, the streaming QualityGate freeze) — without the
    * memo each of them re-derived c2/c1/V from the token stream. The
    * cached frames are vocabulary-sized lazy plans hanging off the same
    * c2 localCheckpoint, so the token stream is scanned once per
    * session, not once per consumer.
    *
    * The key includes a CONTENT-IDENTITY fingerprint of the documents
    * parquet (file listing + sizes + mtimes), not just the path: a
    * corpus appended to or rewritten under the same dir — exactly the
    * streaming-ingest flow QualityGate.freeze serves — must rebuild the
    * model, not silently serve the stale (nll, c1, V) (r12 advice).
    * Entries for superseded fingerprints and for stopped sessions are
    * evicted on access, so the cache never pins localCheckpoint blocks
    * of a corpus version or session that no consumer can reach.
    */
  private val lmModelCache =
    new scala.collection.concurrent.TrieMap[(SparkSession, String, String),
      (DataFrame, DataFrame, Long)]

  /** Sorted (name, size, mtime) listing of `dir`/documents.parquet —
    * cheap (one directory listing, no data read) and changes whenever a
    * file is added, rewritten, or replaced.
    */
  private def docsFingerprint(d: String): String = {
    val p = java.nio.file.Paths.get(d, "documents.parquet")
    if (!java.nio.file.Files.exists(p)) s"absent:$d"
    else if (java.nio.file.Files.isRegularFile(p))
      s"file:${java.nio.file.Files.size(p)}:" +
        java.nio.file.Files.getLastModifiedTime(p).toMillis
    else {
      val st = java.nio.file.Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .map(f => s"${f.getFileName}:${java.nio.file.Files.size(f)}:" +
            java.nio.file.Files.getLastModifiedTime(f).toMillis)
          .toSeq.sorted.mkString(",")
      } finally st.close()
    }
  }

  private[graft] def lmModelTables(s: SparkSession, d: String)
      : (DataFrame, DataFrame, Long) = {
    val fp = docsFingerprint(d)
    // evict: stopped sessions (their entries retain session references
    // and checkpoint blocks forever) and superseded corpus versions
    // under the same (session, dir)
    lmModelCache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped || (k._1 == s && k._2 == d && k._3 != fp))
        lmModelCache.remove(k)
    }
    lmModelCache.getOrElseUpdate((s, d, fp), lmModelTablesBuild(s, d))
  }

  private def lmModelTablesBuild(s: SparkSession, d: String)
      : (DataFrame, DataFrame, Long) = {
    val tok = documents(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
    val n1 = size(col("_toks")) - 1
    val bg = tok.where(size(col("_toks")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("_toks"), lit(1), n1),
          slice(col("_toks"), lit(2), n1))).as("_bg"))
      .select(col("doc_id"), col("_bg")("0").as("a"), col("_bg")("1").as("b"))
    val c2 = bg.groupBy("a", "b").agg(count(lit(1)).as("c2"))
      .localCheckpoint(false)
    val c1 = c2.groupBy("a").agg(sum(col("c2")).as("c1"))
    val v = c2.select(explode(array(col("a"), col("b"))).as("w"))
      .agg(countDistinct(col("w")).as("_v")).head().getLong(0)
    val nll = c2.join(c1, Seq("a"))
      .select(col("a"), col("b"), col("c2"),
        (-log((col("c2") + 1) / (col("c1") + lit(v)))).as("nllw"))
    (nll, c1, v)
  }

  private[graft] def lmNllTable(s: SparkSession, d: String): DataFrame =
    lmModelTables(s, d)._1.select(col("a"), col("b"), col("nllw"))

  /** Logistic quality-classifier weights: bias, token-length feature,
    * punctuation-cleanliness feature, stopword-density feature. Fixed
    * (a "trained model" is a constants table at inference time — the
    * engine-relevant part is the scoring plan, a pure projection).
    */
  val QlBias = -1.5
  val QlLen = 2.0
  val QlPunct = 1.5
  val QlStop = 1.0

  private def transitionPairs(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t", "event_id")
    events(s, d)
      .select(col("user_id"), tsMillis(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
  }

  /** Corpus-level repeated spans: minimum reported length and the
    * deterministic top-K cut (ORDER BY len DESC, span ASC LIMIT K over
    * DISTINCT spans — identical on both engines). Suffix radius and the
    * operator mechanics live in [[SuffixOps]].
    */
  val SpanMinLen = 4
  val SpanTopK = 20

  /** Checkpoint count for the Heaps'-law vocabulary growth curve —
    * bucket width derives from the corpus count so the cumulative
    * window's frame is bounded at this many rows at any scale.
    */
  val HeapsBuckets = 10

  /** Selected winnowing fingerprints: (doc_id, n_kgrams, pos, h) — one
    * row per DISTINCT selected (position, hash). The sequential "pick
    * the rightmost minimum of each sliding window" rule is expressed as
    * a plain sliding-window min over the packed (hash, −pos) key, then
    * DISTINCT — two window passes over ONE doc-keyed sort, token-linear.
    * Docs with fewer than W k-grams keep their single global minimum
    * (the last, full-coverage frame).
    */
  private[graft] def winnowSelected(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kg = documents(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), TextOps.hashAll(col("_toks")).as("_th"))
      .select(col("doc_id"),
        posexplode(Dedup.shingleHashes(col("_th"), WinnowK)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        pmod(col("col"), lit(Dedup.MinhashP)).as("h"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val frame = byDoc.rowsBetween(-(WinnowW - 1), 0)
    kg.withColumn("_key", col("h") * WinnowB + (lit(WinnowB - 1) - col("pos")))
      .withColumn("_mk", min(col("_key")).over(frame))
      .withColumn("_rn", row_number().over(byDoc))
      .withColumn("_L",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .where(col("_rn") >= least(lit(WinnowW), col("_L")))
      .select(col("doc_id"), col("_L").as("n_kgrams"),
        expr(s"_mk div $WinnowB").as("fh"),
        (lit(WinnowB - 1) - pmod(col("_mk"), lit(WinnowB))).as("fpos"))
      .distinct()
  }

  /** Gopher keep/reject thresholds (Rae et al. 2021, §A1.1) — word-count
    * band, mean-word-length band, alpha-word floor, top-{2,3,4}-gram and
    * duplicated-5-gram character-fraction caps. The symbol-ratio and
    * stop-word rules of the full set live in text_quality_score's
    * feature family; n-gram char fractions use length(ngram string)
    * (tokens + separating spaces) over length(text) — one convention,
    * mirrored verbatim by the oracle.
    */
  /** Kneser-Ney absolute discount (the standard 0.75; Chen & Goodman's
    * estimate D = n1/(n1+2·n2) lands near it on natural corpora).
    */
  private val KnDiscount = 0.75

  private[graft] val GopherMinWords = 50L
  private[graft] val GopherMaxWords = 100000L

  private val extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher repetition/quality rules — the canonical LLM-corpus filter
    // set: per document, mean word length, alphabetic-word fraction,
    // the character fraction of the single most frequent 2-/3-/4-gram,
    // and the character fraction covered by DUPLICATED 5-grams, plus
    // the composed keep flag. Scale shape: token-linear everywhere —
    // one word-level keyed agg + three (doc, gram)-keyed partial aggs
    // (map-side combine eats the explode; a hot gram is one reducer
    // key, never cross-document work), top-gram per doc via the
    // deterministic (cnt desc, gram) row_number, doc-keyed joins back.
    // N-gram strings are concatenated AFTER the explode (codegen) from
    // arrays_zip'd slices — the bigramPairs lesson; higher-order
    // transform lambdas are CodegenFallback.
    "quality_gopher_rules" -> ((s, d) =>
      gopherMetrics(s, d).orderBy("doc_id")),
    // Multi-type PII scan + redaction — the pre-release scrub every
    // training corpus gets: per-doc counts of emails / IPv4s / phone
    // numbers / long account-number digit runs, plus the md5 of the
    // redacted text (typed placeholders, email first so its digits
    // can't double-match the id rule). The fixture corpus contains no
    // PII, so every 3rd document gets DETERMINISTIC planted PII built
    // from its doc_id by both engines identically — the planted twins
    // pattern (multimodal_ahash_pairs). Pure projection, zero shuffles:
    // at 100 TB this runs at scan speed, and the plan shape is
    // identical with a real PII model swapped in for the regexes.
    "pii_scan_redact" -> ((s, d) => {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
      val acct = "\\b\\d{9,}\\b"
      val planted = documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com ip 10.0."),
            (col("doc_id") % 256).cast("string"), lit("."),
            (col("doc_id") % 100).cast("string"),
            lit(" call 555-867-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" acct "),
            lpad((col("doc_id") % 1000000000L).cast("string"), 9, "0")))
          .otherwise(col("text")).as("text"))
      val redacted =
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("text"), lit(email), lit("<EMAIL>")),
              lit(ip), lit("<IP>")),
            lit(phone), lit("<PHONE>")),
          lit(acct), lit("<ID>"))
      planted.select(col("doc_id"),
        regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(ip)).cast("long").as("n_ips"),
        regexp_count(col("text"), lit(phone)).cast("long").as("n_phones"),
        regexp_count(col("text"), lit(acct)).cast("long").as("n_ids"),
        md5(redacted).as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // Cross-source contamination matrix: for every source pair, the
    // count and Jaccard of shared distinct token-shingles — the
    // provenance-level view of decontamination (WHICH feeds overlap,
    // not just which documents). Scale shape: the corpus reduces to
    // DISTINCT (source, shingle) in one shuffle; the shingle-keyed
    // self-join fans out at most (#sources choose 2) rows per shingle
    // (sources are a roster, not data-proportional); totals are a
    // roster-sized broadcast. Pairs with zero shared shingles are
    // absent by construction.
    "source_overlap_matrix" -> ((s, d) => {
      val ss = documents(s, d)
        .select(col("source"), TextOps.tokens(col("text")).as("_toks"))
        .select(col("source"), TextOps.hashAll(col("_toks")).as("_th"))
        .select(col("source"), explode(Dedup.shingleHashes(col("_th"))).as("h"))
        .distinct()
      val tot = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
      ss.as("a").join(ss.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("shared"))
        .join(broadcast(tot.select(col("source").as("src_a"), col("n").as("n_a"))),
          Seq("src_a"))
        .join(broadcast(tot.select(col("source").as("src_b"), col("n").as("n_b"))),
          Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("shared"), col("n_a"), col("n_b"),
          expr("shared * 1000000 div (n_a + n_b - shared)").as("jaccard_micro"))
        .orderBy("src_a", "src_b")
    }),

    // RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    // are maximal stopword-free token runs (phrase id = running count
    // of stopword delimiters — one per-doc window), scored by
    // Σ_w deg(w)/freq(w) over corpus-wide word statistics, in integer
    // micro-units so the per-phrase sum is order-independent and the
    // compare exact. Everything is keyed aggregation on (doc, phrase)
    // and word; the emitted list is a bounded TakeOrdered of phrase
    // TYPES (score is a function of the words, so identical phrases
    // agree on it by construction).
    "text_rake_keyphrases" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = documents(s, d)
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
        .select(col("doc_id"), col("pos"), col("col").as("tok"),
          col("col").isInCollection(TextOps.stopwords).cast("int").as("stop"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ph = toks.withColumn("pid", sum(col("stop")).over(w))
        .where(col("stop") === 0)
        .select(col("doc_id"), col("pid"), col("pos"), col("tok"))
      val phrases = ph.groupBy(col("doc_id"), col("pid"))
        .agg(array_join(transform(
            sort_array(collect_list(struct(col("pos"), col("tok")))),
            r => r.getField("tok")), " ").as("phrase"),
          count(lit(1)).as("plen"))
        .where(col("plen") <= RakeMaxLen)
      val words = ph.join(
        phrases.select(col("doc_id"), col("pid"), col("plen")),
        Seq("doc_id", "pid"))
      val ws = words.groupBy(col("tok"))
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      val scored = words.join(ws, "tok")
        .groupBy(col("doc_id"), col("pid"))
        .agg(sum(expr("deg * 1000000 div freq")).as("score_micro"))
      phrases.join(scored, Seq("doc_id", "pid"))
        .groupBy(col("phrase"))
        .agg(count(lit(1)).as("n_occurrences"),
          max(col("score_micro")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("phrase"))
        .limit(RakeTopK)
    }),

    // Inference/training batch padding efficiency under power-of-two
    // length bucketing (the dynamic-batching layout question): per
    // bucket, how much of the padded token grid is real content vs
    // pad. Everything integer; the bucket CASE ladder is one generated
    // SQL text evaluated verbatim by both engines. One projection +
    // one 9-row aggregate — corpus-linear.
    "pad_efficiency" -> ((s, d) => {
      documents(s, d)
        .select(least(size(TextOps.tokens(col("text"))).cast("long"),
          lit(PadLadder.last.toLong)).as("nt"))
        .select(col("nt"), expr(padBucketSql).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("sum_tokens"))
        .select(col("bucket"), col("n_docs"), col("sum_tokens"),
          (col("n_docs") * col("bucket")).as("padded_tokens"),
          expr("(n_docs * bucket - sum_tokens) * 1000000 div (n_docs * bucket)")
            .as("pad_waste_micro"))
        .orderBy("bucket")
    }),

    // Merkle roots per source — shipping-integrity provenance: the
    // ordered per-doc digests fold pairwise (odd node promotes
    // unchanged) up to one root per source, so any single-byte change
    // in any document, or any reorder/drop, changes the root — the
    // audit artifact a corpus hand-off ships next to the data. Scale
    // shape: ceil(log2(max docs/source)) keyed aggregations with the
    // frame HALVING each level (Σ work = 2·docs); the level count is a
    // plan-time driver constant (the pageRank `n` pattern); no windows
    // beyond the leaf ordering, no driver-side hashing. The oracle
    // replays a fixed 20-level chain (2^20 docs/source cap — levels
    // past convergence are pass-through no-ops).
    "corpus_merkle_roots" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val leaves = documents(s, d)
        .select(col("source"),
          (row_number().over(Window.partitionBy(col("source"))
            .orderBy(col("doc_id"))) - 1).cast("long").as("idx"),
          md5(concat_ws(":", col("doc_id"), md5(col("text")))).as("h"))
      val counts = leaves.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val maxn = counts.agg(max(col("n"))).first().getLong(0)
      val levels = math.max(1,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxn - 1)))
      var lvl = leaves
      for (_ <- 1 to levels.toInt) {
        lvl = lvl.groupBy(col("source"), expr("idx div 2").as("pidx"))
          .agg(min(struct(col("idx"), col("h"))).as("_l"),
            max(struct(col("idx"), col("h"))).as("_r"),
            count(lit(1)).as("_c"))
          .select(col("source"), col("pidx").as("idx"),
            when(col("_c") === 2, md5(concat(col("_l.h"), col("_r.h"))))
              .otherwise(col("_l.h")).as("h"))
      }
      lvl.join(broadcast(counts), Seq("source"))
        .select(col("source"), col("n").as("n_docs"),
          col("h").as("merkle_root"))
        .orderBy("source")
    }),

    // Winnowing document fingerprints (the MOSS local fingerprinting
    // algorithm): every window of W consecutive k-gram hashes selects its
    // rightmost minimum; the distinct selections are the document's
    // fingerprint set, with the guarantee that any shared token run of
    // length ≥ k+w−1 yields a shared fingerprint. Emits per-doc counts
    // and an md5 digest of the position-ordered selection — the whole
    // selection is exact-compared, not just its size.
    "text_winnow" -> ((s, d) =>
      winnowSelected(s, d)
        .groupBy(col("doc_id"))
        .agg(max(col("n_kgrams")).as("n_kgrams"),
          (max(col("n_kgrams")) -
            least(lit(WinnowW.toLong), max(col("n_kgrams"))) + 1L)
            .as("n_windows"),
          count(lit(1)).as("n_fp"),
          md5(concat_ws(",",
            transform(sort_array(collect_list(struct(col("fpos"), col("fh")))),
              r => concat_ws(":", r.getField("fpos"), r.getField("fh")))))
            .as("fp_digest"))
        .orderBy("doc_id")),

    // Winnowing near-dup candidates: doc pairs sharing >= WinnowMinShared
    // selected fingerprints, after dropping fingerprints that occur in
    // more than WinnowFreqCap documents (stop-fingerprints — boilerplate
    // hashes would otherwise turn the fingerprint-keyed join quadratic
    // on one hot key; the cap bounds any key's fan-out at Cap², the same
    // trick the banded LSH families use). Fingerprint hash is the ONLY
    // corpus-wide join key.
    "winnow_match_pairs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val fps = winnowSelected(s, d)
        .select(col("doc_id"), col("fh")).distinct()
        .withColumn("_df", count(lit(1)).over(Window.partitionBy(col("fh"))))
        .where(col("_df") <= WinnowFreqCap)
        .select(col("doc_id"), col("fh"))
      fps.as("a").join(fps.as("b"),
          col("a.fh") === col("b.fh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= WinnowMinShared)
        .orderBy("id_a", "id_b")
    }),

    // Longest repeated token span WITHIN each document — the suffix-array
    // classic (SuffixOps.longestRepeatedSpan: doc-keyed suffix sort, max
    // adjacent LCP, smallest-span tie-break).
    "text_longest_repeat" -> ((s, d) =>
      SuffixOps.longestRepeatedSpan(documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Corpus-level top-K repeated token spans — the cross-document
    // suffix-array form (SuffixOps.topRepeatedSpans: prefix-2-banded
    // suffix adjacency + broadcast occurrence count).
    "corpus_top_repeated_spans" -> ((s, d) =>
      SuffixOps.topRepeatedSpans(documents(s, d), "doc_id", "text",
          minLen = SpanMinLen, topK = SpanTopK)
        .orderBy(col("span_len").desc, col("span").asc)),
    // Logistic quality classifier: sigmoid over the same deterministic
    // text features the linear quality score uses — the model-scoring
    // plan shape (broadcast weights × pure projection, zero shuffles
    // beyond the scan). exp() is libm on both engines; scores are O(1)
    // so round(6) absorbs last-ulp differences.
    "quality_logistic" -> ((s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          size(col("_toks")).cast("double").as("nt"),
          length(col("text")).cast("double").as("nc"),
          TextOps.punctCount(col("text")).cast("double").as("np"),
          TextOps.stopwordCount(col("_toks")).cast("double").as("ns"))
      t.select(col("doc_id"),
          (lit(QlBias) + lit(QlLen) * least(col("nt") / 100.0, lit(1.0))
            + lit(QlPunct) * (lit(1.0) - col("np") / col("nc"))
            + lit(QlStop) * (col("ns") / col("nt"))).as("z"))
        .select(col("doc_id"), round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("score"))
        .withColumn("keep", col("score") >= 0.5)
        .orderBy("doc_id")
    }),

    // Per-user event-type transition statistics (first-order Markov
    // shape): lag window per user (sort-based, spillable), then one
    // keyed aggregation over (prev, next) and a conditional probability
    // against the prev-type marginal — transition matrices for behavior
    // modeling / sessionless funnel analysis.
    "event_transitions" -> ((s, d) => {
      val pairs = transitionPairs(s, d)
      val c2 = pairs.groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val c1 = pairs.groupBy(col("prev_type")).agg(count(lit(1)).as("n_prev"))
      c2.join(c1, "prev_type")
        .select(col("prev_type"), col("next_type"), col("n"),
          round(col("n") / col("n_prev"), 6).as("p_next"))
        .orderBy("prev_type", "next_type")
    }),

    // Deterministic train/val/test split: bucket each doc by the first
    // byte of md5(doc_id) — content-stable (re-runs and backfills land
    // every doc in the same split, no RNG state), join-free, and a pure
    // zero-shuffle projection at any scale. Boundaries 0xcd/0xe6 give
    // ~80/10/10 in expectation.
    "corpus_split" -> ((s, d) => {
      val h2 = substring(md5(col("doc_id").cast("string")), 1, 2)
      documents(s, d)
        .select(col("doc_id"),
          when(h2 < "cd", "train").when(h2 < "e6", "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    }),

    // Unigram-LM (SentencePiece-style) tokenizer TRAINING — the third
    // member of the tokenizer family (BPE merges train the vocab
    // bottom-up, greedy WordPiece serves longest-match; unigram scores
    // pieces and Viterbi-segments): substring candidates → one EM-style
    // round (Viterbi segment, usage recount) → top-V prune. Integer
    // objective throughout (ext/Unigram doc) so the DuckDB replay — a
    // generated 16-stage DP chain + recursive walkback — compares
    // EXACTLY. All post-corpus stages are vocab-sized.
    "unigram_vocab" -> ((s, d) =>
      Unigram.trainVocab(documents(s, d), "text").orderBy("token_id")),

    // Viterbi ENCODING under the trained unigram vocabulary: per doc,
    // every word's segmentation in document order (kernel once per
    // DISTINCT word, broadcast join back — the greedyTokenizeWith
    // plan). The oracle replays training AND re-runs the DP under the
    // final vocab.
    "unigram_encode" -> ((s, d) => {
      val docs = documents(s, d)
      Unigram.encodeWith(docs, "doc_id", "text",
        Unigram.trainedVocab(docs, "text")).orderBy("doc_id")
    }),

    // T5/UL2-style SPAN CORRUPTION for denoising objectives: tokens
    // partition into fixed 3-token blocks; a block is masked iff the
    // content-stable coin md5(doc_id:block) < 1/4 — per-token-independent
    // (no sequential scan), reproducible, and span-shaped by
    // construction. The input replaces each masked block with its
    // sentinel <Xk> (k = per-doc rank of the masked block); the target
    // is the sentinel-prefixed masked content — exactly the (input,
    // target) pair a denoising trainer consumes. One explode + per-doc
    // keyed windows/aggs; reassembly via (pos) struct sort, no global
    // sort.
    "span_corrupt" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = documents(s, d)
        .select(col("doc_id"),
          posexplode(split(lower(col("text")), "\\s+")).as(Seq("wpos", "tok")))
        .where(col("tok") =!= "")
        .withColumn("blk", (col("wpos") / 3).cast("long"))
        .withColumn("masked",
          substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            col("blk").cast("string"))), 1, 1) < "4")
      // 0-based sentinel rank k per masked block, in document order
      val blocks = toks.where(col("masked"))
        .select(col("doc_id"), col("blk")).distinct()
        .withColumn("k", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("blk"))) - 1)
      val joined = toks.join(blocks, Seq("doc_id", "blk"), "left")
        .withColumn("_fp", min(col("wpos")).over(
          Window.partitionBy(col("doc_id"), col("blk"))))
      // input: unmasked tokens verbatim; each masked block collapses to
      // one <Xk> anchored at the block's first token position
      val input = joined
        .where(col("k").isNull || col("wpos") === col("_fp"))
        .select(col("doc_id"),
          struct(col("wpos").as("p"),
            when(col("k").isNull, col("tok"))
              .otherwise(concat(lit("<X"), col("k"), lit(">"))).as("t"))
            .as("part"))
        .groupBy("doc_id")
        .agg(array_join(transform(array_sort(collect_list(col("part"))),
          s => s("t")), " ").as("input"))
      // target: per masked block, <Xk> followed by the masked tokens
      val tgt = joined.where(col("k").isNotNull)
        .select(col("doc_id"),
          struct(col("wpos").as("p"),
            when(col("wpos") === col("_fp"),
              concat(lit("<X"), col("k"), lit("> "), col("tok")))
              .otherwise(col("tok")).as("t")).as("part"))
        .groupBy("doc_id")
        .agg(array_join(transform(array_sort(collect_list(col("part"))),
          s => s("t")), " ").as("target"),
          count(lit(1)).as("n_masked_tokens"))
      val spans = blocks.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      input.join(tgt, Seq("doc_id"), "left")
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("input"),
          coalesce(col("target"), lit("")).as("target"),
          coalesce(col("n_masked_tokens"), lit(0L)).as("n_masked_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"))
        .orderBy("doc_id")
    }),

    // Token-ID sequences under the trained unigram vocabulary — the
    // bpe_tokenize twin for the Viterbi tokenizer: the artifact a
    // training pipeline consumes (dense ids in document order, <unk>
    // words as -1), reassembled via (wpos, ppos) struct sort — no
    // global sort.
    "unigram_tokenize" -> ((s, d) =>
      Unigram.tokenIds(documents(s, d), "doc_id", "text").orderBy("doc_id")),

    // Deterministic epoch shuffle + shard layout — the data-loader step
    // of a training pipeline: each doc gets a content-stable
    // pseudo-random rank for the epoch (md5 over doc_id + epoch salt),
    // a shard (≈ one bounded loader file), and its position within the
    // shard. Idempotent across re-runs/backfills (no RNG state);
    // changing the salt yields an independent permutation per epoch.
    // Scale shape: hash+bucket is a zero-shuffle projection; the
    // within-shard ordering is ONE hash-partitioned shuffle whose
    // parallelism is numShards — and shards scale with the corpus
    // (bounded docs per shard at 100 TB), so the row_number window
    // never serializes onto a fixed task count. A global ORDER BY of
    // the whole corpus is exactly what this layout avoids.
    "corpus_shuffle_shards" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nShards = 8
      documents(s, d)
        .select(col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit(":epoch1"))).as("h"))
        .withColumn("shard",
          (conv(substring(col("h"), 1, 2), 16, 10).cast("int") % nShards)
            .as("shard"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
          .cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos")
    }),

    // Heaps'-law vocabulary growth curve: cumulative distinct token
    // types vs cumulative tokens over the doc_id-ordered corpus at
    // `HeapsBuckets` checkpoints (bucket width derives from the corpus
    // count — the adaptive-k pattern, formula replayed in the oracle).
    // This is the capacity-planning query behind every "vocabulary-
    // sized" table in the engine (LM c2/c1, BPE merges, retrieval
    // postings): it measures the exponent that says how those tables
    // grow with the corpus. Shapes: one explode, two keyed aggs
    // (per-bucket token counts; per-type min-doc first sighting — both
    // partial-aggregable), then a cumulative window over a frame
    // bounded at HeapsBuckets rows regardless of corpus size (the
    // compaction-plan rule: global windows only over provably
    // constant-sized frames).
    "corpus_heaps_law" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
      val nDocs = docs.count()
      val bw = math.max(1L, (nDocs + HeapsBuckets - 1) / HeapsBuckets)
      val tok = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("tk"))
      val ntok = tok.select(expr(s"doc_id div $bw").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_tok"))
      val ntyp = tok.groupBy(col("tk")).agg(min(col("doc_id")).as("fd"))
        .select(expr(s"fd div $bw").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
      ntok.join(ntyp, Seq("bucket"), "left")
        .select(col("bucket"),
          sum(col("n_tok")).over(w).as("cum_tokens"),
          sum(coalesce(col("n_new"), lit(0L))).over(w).as("cum_types"))
        .orderBy("bucket")
    }),

    // URL/domain frequency — the crawl-hygiene pass that finds boiler-
    // plate domains and link farms before training. URLs are planted
    // deterministically (doc_id % 5, 21 distinct domains from the
    // doc_id % 7 × % 3 product — the pii_scan_redact pattern, fixture
    // text has no URLs), extracted with one capture-group regex, and
    // aggregated per domain (URL mentions + distinct docs). Projection
    // + explode + one keyed agg; a hot domain is one reducer key
    // (AQE-splittable), never a pairwise anything.
    "text_url_domains" -> ((s, d) => {
      urlPlantedText(s, d)
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(text, 'https?://([a-z0-9.-]+)', 1)"))
            .as("domain"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("domain")
    }),

    // Shard-mix quality: Shannon entropy of the SOURCE distribution
    // inside each shuffle shard — the measurement a pipeline runs to
    // confirm its epoch shuffle actually mixed the corpus (a degenerate
    // hash would leave shards source-pure: entropy ~0; a good shuffle
    // puts every shard near the corpus-level mix: entropy ~ln(sources)).
    // Same md5 shard assignment as corpus_shuffle_shards. Each
    // (shard, source) term −p·ln(p) is quantized to MICRO-units before
    // the per-shard sum (the BM25/PMI recipe: ln ulps sit behind the
    // rounding, and the reduction is an order-independent long sum).
    // Two keyed aggregations, shard-count-sized output.
    "shard_mix_entropy" -> ((s, d) => {
      val nShards = 8
      val cells = documents(s, d)
        .select(col("source"),
          (conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":epoch1"))), 1, 2), 16, 10).cast("int") % nShards)
            .as("shard"))
        .groupBy("shard", "source").agg(count(lit(1)).as("c"))
      cells
        .withColumn("n", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))))
        .withColumn("term_micro",
          expr("cast(round(-(cast(c as double) / n)" +
            " * ln(cast(c as double) / n) * 1000000) as bigint)"))
        .groupBy("shard")
        .agg(max(col("n")).as("n_docs"),
          count(lit(1)).as("n_sources"),
          (sum(col("term_micro")).cast("double") / lit(1000000.0))
            .as("entropy"))
        .orderBy("shard")
    }),

    // Trailing-window z-score anomaly detection: each event scored
    // against the mean/stddev of its type's value over the preceding
    // hour (RANGE frame on epoch seconds). A bare
    // Window.partitionBy(event_type) would serialize each type onto one
    // task (a handful of types = a handful of tasks at 100 TB), so this
    // routes through TimeSeries.trailingWindow: overlapping 6 h chunks,
    // (type × chunk) parallelism, identical frame semantics. Events more
    // than 2.5 sigma out, with at least 5 trailing samples, are flagged.
    "anomaly_zscore" -> ((s, d) => {
      val e = events(s, d)
        .select(col("event_id"), col("event_type"),
          (tsMillis(col("ts")) / 1000L).cast("long").as("sec"), col("value"))
      graft.ops.TimeSeries.trailingWindow(
          e, Seq(col("event_type")), col("sec"), 3600L, 21600L) { w =>
        Seq("n_trail" -> count(lit(1)).over(w),
          "mu" -> avg(col("value")).over(w),
          "sd" -> stddev_samp(col("value")).over(w))
      }
        .where(col("n_trail") >= 5 && col("sd") > 0)
        .select(col("event_id"), col("event_type"), col("n_trail"),
          round((col("value") - col("mu")) / col("sd"), 6).as("z"))
        .where(abs(col("z")) > 2.5)
        .orderBy("event_id")
    }),

    // Logistic quality-classifier TRAINING (`ext/QualityModel`): batch
    // gradient descent where each iteration is ONE corpus aggregation —
    // per-row gradient is a pure projection, the reduction ships 4 longs
    // + a count to the driver (the constant-traffic training pattern of
    // trainPqBook/Bpe.trainMerges). Exact-portable by construction:
    // rational fast sigmoid (no libm) + integer micro-unit gradient sums
    // keep the weights bit-identical to the oracle's replay chain.
    "quality_train_weights" -> ((s, d) => {
      import s.implicits._
      val m = QualityModel.train(documents(s, d))
      Seq(("bias", QualityModel.r6(m.w(0))), ("w_len", QualityModel.r6(m.w(1))),
          ("w_punct", QualityModel.r6(m.w(2))), ("w_stop", QualityModel.r6(m.w(3))))
        .toDF("feature", "weight").orderBy("feature")
    }),

    // The trained model SERVING over the corpus — the training→serving
    // edge (same edge r8 wired for PQ/IVF): trained weights enter the
    // plan as broadcast constants, scoring is a zero-shuffle projection
    // with the identical plan shape as fixed-weight quality_logistic.
    "quality_train_scores" -> ((s, d) => {
      val docs = documents(s, d)
      val m = QualityModel.train(docs)
      QualityModel.score(docs, m).orderBy("doc_id")
    }),

    // PSI drift monitor: population stability index of the quality
    // features between the deterministic train/val corpus splits — the
    // standard production check that a refreshed corpus (or a new split)
    // still looks like what the filters were tuned on. One text pass,
    // one constant-cardinality (feature × bin) aggregation; the
    // (30-row) bin grid and per-feature totals are plan constants, so
    // the whole monitor is corpus-linear with a KB-sized shuffle.
    // PSI convention: add-0.5 smoothing so empty bins stay finite;
    // |psi| < 0.1 = stable, 0.1-0.25 = drifting, > 0.25 = act.
    "drift_psi" -> ((s, d) => {
      val h2 = substring(md5(col("doc_id").cast("string")), 1, 2)
      val docs = documents(s, d).withColumn("split",
        when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test"))
      val trainBins = Drift.featureBins(docs.where(col("split") === "train"))
      val valBins = Drift.featureBins(docs.where(col("split") === "val"))
      Drift.psiVsBaseline(valBins, trainBins).orderBy("feature", "bin")
    }),

    // Curriculum planning: LM-difficulty quartile buckets × language,
    // with uniform-target resample weights — the composite that turns
    // the bigram-LM scorer into a training SCHEDULE (easy→hard
    // curriculum / difficulty-stratified mixture). Per-lang quartile
    // boundaries are EXACT interpolated percentiles at dyadic fractions
    // (.25/.75); boundaries fall strictly between round-6 data values
    // (or exactly on a tied value), so a cross-engine ulp in the
    // interpolation can never flip a bucket. Cells and totals are
    // constant-cardinality aggregates; the only corpus-sized work is
    // the shared lmScores chain.
    "pipeline_curriculum" -> ((s, d) => {
      val meta = documents(s, d).select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("_nt"))
      val scored = lmScores(s, d).join(meta, Seq("doc_id"))
      val q = scored.groupBy("lang").agg(
        expr("percentile(nll, 0.25)").as("q1"),
        expr("percentile(nll, 0.75)").as("q3"))
      val cells = scored.join(broadcast(q), Seq("lang"))
        .withColumn("bucket",
          when(col("nll") <= col("q1"), "easy")
            .when(col("nll") <= col("q3"), "medium")
            .otherwise("hard"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("token_mass"))
      val tot = cells.agg(sum(col("token_mass")).as("_tm"),
        count(lit(1)).as("_nc"))
      cells.crossJoin(broadcast(tot))
        .select(col("lang"), col("bucket"), col("n_docs"), col("token_mass"),
          round(col("_tm").cast("double") / col("_nc") / col("token_mass"), 6)
            .as("weight"))
        .orderBy("lang", "bucket")
    }),

    // Content-defined chunking (Dedup.cdcChunks): variable-width chunks
    // whose boundaries depend only on local token content, so one-token
    // edits re-synchronize immediately — the storage-dedup complement of
    // the fixed-width dup_span family (where an insertion shifts every
    // downstream window). Emits one row per chunk with its Horner
    // content hash; the oracle recomputes boundary positions, chunk ids,
    // and hashes from scratch.
    "cdc_chunks" -> ((s, d) =>
      Dedup.cdcChunks(documents(s, d), "doc_id", "text")
        .orderBy("doc_id", "chunk_id")),

    // Chunk-level dedup over the CDC chunks: per-document share of token
    // mass in chunks whose content hash occurs in MORE THAN ONE distinct
    // document (the dup_span_ratio question asked at chunk granularity —
    // what a CDC-based corpus store would actually deduplicate). The
    // chunk hash is the only corpus-wide shuffle key.
    "cdc_dedup_ratio" -> ((s, d) => {
      val ch = Dedup.cdcChunks(documents(s, d), "doc_id", "text")
      // per-hash doc count via groupBy, NOT Window.partitionBy(chunk_hash):
      // a boilerplate chunk shared by most of the corpus would land its
      // whole (hash, doc) group on one window task, while the aggregate
      // partial-combines map-side (the BM25-df lesson, commit 079bdab)
      val dupH = ch.select("chunk_hash", "doc_id").distinct()
        .groupBy("chunk_hash").agg(count(lit(1)).as("ndoc"))
        .where(col("ndoc") > 1).select("chunk_hash")
        .withColumn("_dup", lit(1L))
      ch.join(dupH, Seq("chunk_hash"), "left")
        .groupBy("doc_id")
        .agg(sum(col("n_toks")).as("n_tokens"),
          count(lit(1)).as("n_chunks"),
          sum(when(col("_dup") === 1L, col("n_toks")).otherwise(lit(0L)))
            .as("dup_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
          col("dup_tokens"),
          round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
            .as("dup_ratio"))
        .orderBy("doc_id")
    }))

  /** Oracle replay of `QualityModel.train` (one CTE block per gradient
    * iteration, ending in CTE `w<iters>`; `feats` stays in scope for the
    * serving oracle). Exactness contract: identical left-to-right double
    * expressions, rational fast sigmoid, integer micro-unit gradient
    * sums — see the QualityModel scaladoc.
    */
  private[queries] def duckQualityTrainChain(iters: Int): String = {
    val stop = TextOps.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    val lr = QualityModel.Lr
    val sb = new StringBuilder
    sb ++= s"""tq AS (SELECT doc_id, text, $duckToks AS toks FROM documents),
      |fq AS (SELECT doc_id,
      |  CAST(len(toks) AS DOUBLE) AS nt, CAST(len(text) AS DOUBLE) AS nc,
      |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS np,
      |  CAST(len(list_filter(toks, x -> list_contains($stop, x))) AS DOUBLE) AS ns
      |FROM tq),
      |rawf AS (SELECT doc_id, least(nt / 100.0, 1.0) AS x1,
      |  (1.0 - np / nc) AS x2, (ns / nt) AS x3,
      |  CASE WHEN round(least(nt / 100.0, 1.0) * 0.3 + (1.0 - np / nc) * 0.4 + (ns / nt) * 0.3, 6) >= 0.5
      |       THEN 1.0 ELSE 0.0 END AS y
      |FROM fq WHERE nt > 0 AND nc > 0),
      |st AS (SELECT count(*) AS n,
      |  CAST(sum(CAST(round(x1 * 1e6, 0) AS BIGINT)) AS BIGINT) AS s11,
      |  CAST(sum(CAST(round(x2 * 1e6, 0) AS BIGINT)) AS BIGINT) AS s12,
      |  CAST(sum(CAST(round(x3 * 1e6, 0) AS BIGINT)) AS BIGINT) AS s13,
      |  CAST(sum(CAST(round(x1 * x1 * 1e6, 0) AS BIGINT)) AS BIGINT) AS s21,
      |  CAST(sum(CAST(round(x2 * x2 * 1e6, 0) AS BIGINT)) AS BIGINT) AS s22,
      |  CAST(sum(CAST(round(x3 * x3 * 1e6, 0) AS BIGINT)) AS BIGINT) AS s23
      |  FROM rawf),
      |mus AS (SELECT
      |  CAST(s11 AS DOUBLE) / 1e6 / n AS mu1,
      |  CAST(s12 AS DOUBLE) / 1e6 / n AS mu2,
      |  CAST(s13 AS DOUBLE) / 1e6 / n AS mu3 FROM st),
      |sds AS (SELECT
      |  sqrt(greatest(CAST(st.s21 AS DOUBLE) / 1e6 / st.n - mus.mu1 * mus.mu1, 0.0)) AS sd1,
      |  sqrt(greatest(CAST(st.s22 AS DOUBLE) / 1e6 / st.n - mus.mu2 * mus.mu2, 0.0)) AS sd2,
      |  sqrt(greatest(CAST(st.s23 AS DOUBLE) / 1e6 / st.n - mus.mu3 * mus.mu3, 0.0)) AS sd3
      |  FROM st, mus),
      |feats AS (SELECT doc_id,
      |  CASE WHEN sd1 > 0 THEN (x1 - mu1) / sd1 ELSE 0.0 END AS x1,
      |  CASE WHEN sd2 > 0 THEN (x2 - mu2) / sd2 ELSE 0.0 END AS x2,
      |  CASE WHEN sd3 > 0 THEN (x3 - mu3) / sd3 ELSE 0.0 END AS x3, y
      |  FROM rawf, mus, sds),
      |w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""",
        |p$t AS (SELECT x1, x2, x3, y,
        |  0.5 + 0.5 * (z / (1.0 + abs(z))) AS p
        |  FROM (SELECT f.x1, f.x2, f.x3, f.y,
        |          w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS z
        |        FROM feats f, w${t - 1} w)),
        |g$t AS (SELECT count(*) AS n,
        |  CAST(sum(CAST(round((p - y) * 1e6, 0) AS BIGINT)) AS BIGINT) AS g0,
        |  CAST(sum(CAST(round((p - y) * x1 * 1e6, 0) AS BIGINT)) AS BIGINT) AS g1,
        |  CAST(sum(CAST(round((p - y) * x2 * 1e6, 0) AS BIGINT)) AS BIGINT) AS g2,
        |  CAST(sum(CAST(round((p - y) * x3 * 1e6, 0) AS BIGINT)) AS BIGINT) AS g3
        |  FROM p$t),
        |w$t AS (SELECT
        |  w.b - $lr * (CAST(g.g0 AS DOUBLE) / 1e6 / g.n) AS b,
        |  w.w1 - $lr * (CAST(g.g1 AS DOUBLE) / 1e6 / g.n) AS w1,
        |  w.w2 - $lr * (CAST(g.g2 AS DOUBLE) / 1e6 / g.n) AS w2,
        |  w.w3 - $lr * (CAST(g.g3 AS DOUBLE) / 1e6 / g.n) AS w3
        |  FROM w${t - 1} w, g$t g)""".stripMargin
    }
    sb.toString
  }

  // ---- unigram tokenizer oracle generation ---------------------------
  private val UniPieceCost = graft.functions.UnigramVocab.PieceCost
  private val UniMaxWordLen = graft.functions.UnigramVocab.MaxWordLen

  /** Generated Viterbi DP chain (one MATERIALIZED stage per prefix
    * length — the PageRank/quality-train oracle pattern; DuckDB has no
    * best-per-state recursion) + a recursive walkback, under vocabulary
    * CTE `candCte` (piece, w). Emits `{pfx}seg(word, pos, piece)` for
    * every reachable ≤MaxWordLen word of `wseg`. Mirrors
    * `UnigramVocab.pieces` exactly: integer cost, ties to the longest
    * last piece.
    */
  private def duckViterbi(pfx: String, candCte: String): String = {
    val sb = new StringBuilder
    sb ++= s"""${pfx}dp0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost,
      |  CAST(NULL AS VARCHAR) AS bp FROM wseg)""".stripMargin
    for (p <- 1 to UniMaxWordLen) {
      val branches = (1 to math.min(Unigram.MaxPieceLen, p)).map { l =>
        s"""SELECT d.word, d.cost + $UniPieceCost - v.w AS cost, v.piece AS bp
           |      FROM ${pfx}dp${p - l} d JOIN $candCte v
           |        ON v.piece = substr(d.word, ${p - l + 1}, $l)
           |      WHERE len(d.word) >= $p""".stripMargin
      }.mkString("\n      UNION ALL\n")
      sb ++= s""",
        |${pfx}dp$p AS MATERIALIZED (
        |  SELECT word, $p AS pos, cost, bp FROM (
        |    SELECT word, cost, bp, row_number() OVER (PARTITION BY word
        |      ORDER BY cost, len(bp) DESC, bp) AS rk
        |    FROM ($branches))
        |  WHERE rk = 1)""".stripMargin
    }
    sb ++= s""",
      |${pfx}dpall AS MATERIALIZED (${(1 to UniMaxWordLen)
        .map(p => s"SELECT * FROM ${pfx}dp$p").mkString(" UNION ALL ")}),
      |${pfx}wb AS (
      |  SELECT word, pos FROM ${pfx}dpall WHERE pos = len(word)
      |  UNION ALL
      |  SELECT w.word, w.pos - len(d.bp) FROM ${pfx}wb w
      |    JOIN ${pfx}dpall d ON d.word = w.word AND d.pos = w.pos
      |  WHERE w.pos > 0),
      |${pfx}seg AS MATERIALIZED (
      |  SELECT w.word, d.pos, d.bp AS piece FROM ${pfx}wb w
      |  JOIN ${pfx}dpall d ON d.word = w.word AND d.pos = w.pos)""".stripMargin
    sb.toString
  }

  /** Shared training chain: word freqs → substring candidates (top-K ∪
    * single chars) → round-1 Viterbi → usage recount → final vocab.
    */
  private def duckUnigramBase: String =
    s"""wf AS MATERIALIZED (
       |  SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
       |    FROM documents)
       |  WHERE word <> '' GROUP BY 1),
       |subs AS MATERIALIZED (
       |  SELECT piece, sum(freq) AS w FROM (
       |    SELECT substr(w.word, i.i, l.l) AS piece, w.freq
       |    FROM wf w,
       |         unnest(generate_series(1, len(w.word))) AS i(i),
       |         unnest(generate_series(1, ${Unigram.MaxPieceLen})) AS l(l)
       |    WHERE i.i + l.l - 1 <= len(w.word))
       |  GROUP BY 1),
       |cand0 AS (SELECT piece, w FROM subs
       |          ORDER BY w DESC, piece LIMIT ${Unigram.CandK}),
       |cand AS MATERIALIZED (
       |  SELECT piece, max(w) AS w FROM (
       |    SELECT piece, w FROM cand0
       |    UNION ALL SELECT piece, w FROM subs WHERE len(piece) = 1)
       |  GROUP BY 1),
       |wseg AS MATERIALIZED (SELECT word, freq FROM wf
       |                      WHERE len(word) <= $UniMaxWordLen),
       |${duckViterbi("r1", "cand")},
       |usage_ AS MATERIALIZED (
       |  SELECT s.piece, sum(w.freq) AS usage FROM r1seg s
       |  JOIN wseg w USING (word) GROUP BY 1),
       |vocabf0 AS MATERIALIZED (SELECT piece, usage FROM usage_
       |                         ORDER BY usage DESC, piece LIMIT ${Unigram.TopV}),
       |vocabf AS MATERIALIZED (SELECT piece, usage AS w FROM vocabf0)""".stripMargin

  /** Shared suffix-frame CTE for the suffix-array oracles (mirrors
    * [[suffixes]]: W-capped token slices, one per position).
    */
  private def duckSuffixes: String =
    s"""toks AS (SELECT doc_id, $duckToks AS t FROM documents),
       |sfx AS (
       |  SELECT doc_id, t[i : least(i + ${SuffixOps.SuffixW - 1}, len(t))] AS s
       |  FROM (SELECT doc_id, t FROM toks),
       |       unnest(generate_series(1, len(t))) AS u(i))""".stripMargin

  /** Selected winnowing fingerprints CTE chain — mirrors
    * [[winnowSelected]] (same Horner k-gram hashes, same packed
    * rightmost-min key, same short-doc fallback).
    */
  private def duckWinnowSel: String = {
    val (k, w, b, p, a) =
      (WinnowK, WinnowW, WinnowB, Dedup.MinhashP, Dedup.ShingleA)
    s"""wth AS (SELECT doc_id, list_transform($duckToks, tk -> ${duckH32("tk")}) AS th
       |  FROM documents),
       |wkg0 AS (SELECT doc_id, unnest(CASE WHEN len(th) < $k
       |    THEN list_transform(generate_series(1, len(th)),
       |           i -> struct_pack(pos := i, h := th[i] % $p))
       |    ELSE list_transform(generate_series(1, len(th) - ${k - 1}),
       |           i -> struct_pack(pos := i, h := list_reduce(th[i:i+${k - 1}],
       |                  (x, y) -> (x * $a + y) % $p))) END) AS kh
       |  FROM wth),
       |wkg AS (SELECT doc_id, CAST(kh.pos AS BIGINT) AS pos, kh.h AS h FROM wkg0),
       |wwm AS (SELECT doc_id, pos, h,
       |    min(h * $b + ($b - 1 - pos)) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS mk,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
       |    count(*) OVER (PARTITION BY doc_id) AS l
       |  FROM wkg),
       |wsel AS (SELECT DISTINCT doc_id, CAST(l AS BIGINT) AS n_kgrams,
       |    mk // $b AS fh, $b - 1 - (mk % $b) AS fpos
       |  FROM wwm WHERE rn >= least($w, l))""".stripMargin
  }

  private def duckGram(n: Int): String = {
    val parts = (0 until n).map(o => s"toks[i + $o]").mkString(" || ' ' || ")
    s"""g$n AS (SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len(toks) - ${n - 1}), i -> $parts)) AS g
       |  FROM t),
       |c$n AS (SELECT doc_id, g, count(*) AS cnt FROM g$n GROUP BY 1, 2)""".stripMargin
  }

  /** Gopher-rules CTE chain ending in `gop (doc_id, n_words, fractions,
    * keep)` — mirrors [[gopherMetrics]]; shared by the standalone oracle
    * and the corpus-prep v2 composite in [[ExtensionQueries]].
    */
  private[queries] lazy val duckGopherCtes: String =
    s"""t AS (SELECT doc_id, length(text) AS nc, $duckToks AS toks
       |  FROM documents),
       |w AS (SELECT doc_id, nc, unnest(toks) AS tok FROM t),
       |ws AS (SELECT doc_id, nc, count(*) AS n_words,
       |    sum(length(tok)) AS sl,
       |    sum(CASE WHEN regexp_matches(tok, '[a-z]') THEN 1 ELSE 0 END)
       |      AS na
       |  FROM w GROUP BY 1, 2),
       |${duckGram(2)},
       |${duckGram(3)},
       |${duckGram(4)},
       |${duckGram(5)},
       |t2 AS (SELECT doc_id, cnt * length(g) AS tc FROM c2
       |  QUALIFY row_number() OVER (PARTITION BY doc_id
       |    ORDER BY cnt DESC, g) = 1),
       |t3 AS (SELECT doc_id, cnt * length(g) AS tc FROM c3
       |  QUALIFY row_number() OVER (PARTITION BY doc_id
       |    ORDER BY cnt DESC, g) = 1),
       |t4 AS (SELECT doc_id, cnt * length(g) AS tc FROM c4
       |  QUALIFY row_number() OVER (PARTITION BY doc_id
       |    ORDER BY cnt DESC, g) = 1),
       |d5 AS (SELECT doc_id, sum(cnt * length(g)) AS dc FROM c5
       |  WHERE cnt > 1 GROUP BY 1),
       |m AS (SELECT ws.doc_id, n_words,
       |    round(CAST(sl AS DOUBLE) / nullif(n_words, 0), 6) AS mean_word_len,
       |    round(CAST(na AS DOUBLE) / nullif(n_words, 0), 6) AS alpha_frac,
       |    round(CAST(coalesce(t2.tc, 0) AS DOUBLE) / nullif(nc, 0), 6) AS top2_frac,
       |    round(CAST(coalesce(t3.tc, 0) AS DOUBLE) / nullif(nc, 0), 6) AS top3_frac,
       |    round(CAST(coalesce(t4.tc, 0) AS DOUBLE) / nullif(nc, 0), 6) AS top4_frac,
       |    round(CAST(coalesce(d5.dc, 0) AS DOUBLE) / nullif(nc, 0), 6) AS dup5_frac
       |  FROM ws LEFT JOIN t2 ON t2.doc_id = ws.doc_id
       |          LEFT JOIN t3 ON t3.doc_id = ws.doc_id
       |          LEFT JOIN t4 ON t4.doc_id = ws.doc_id
       |          LEFT JOIN d5 ON d5.doc_id = ws.doc_id),
       |gop AS (SELECT doc_id, n_words, mean_word_len, alpha_frac,
       |    top2_frac, top3_frac, top4_frac, dup5_frac,
       |    (n_words BETWEEN $GopherMinWords AND $GopherMaxWords
       |     AND mean_word_len BETWEEN 3.0 AND 10.0
       |     AND alpha_frac >= 0.8
       |     AND top2_frac <= 0.2 AND top3_frac <= 0.18
       |     AND top4_frac <= 0.16 AND dup5_frac <= 0.15) AS keep
       |  FROM m)""".stripMargin

  /** Smoothed-bigram-LM CTE chain ending in
    * `lmsc (doc_id, n_bigrams, nll)` — mirrors [[lmScores]]. CTE names
    * carry an `lm` prefix so the chain composes into larger WITH blocks
    * (the gopher chain also defines a `c2`). ONE definition shared by
    * `lm_bigram_score`, `corpus_ppl_filter`, and the corpus-prep v2
    * composite, so the gate's mirror cannot silently desync from the LM
    * recipe.
    */
  private[queries] lazy val duckLmNllCtes: String =
    s"""lmtok AS (SELECT doc_id, $duckToks AS toks FROM documents),
       |lmbg AS (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |    i -> struct_pack(a := toks[i], b := toks[i+1]))) AS bg
       |  FROM lmtok WHERE len(toks) >= 2),
       |lmp AS (SELECT doc_id, bg.a AS a, bg.b AS b FROM lmbg),
       |lmc2 AS (SELECT a, b, count(*) AS c2 FROM lmp GROUP BY a, b),
       |lmc1 AS (SELECT a, count(*) AS c1 FROM lmp GROUP BY a),
       |lmv AS (SELECT count(DISTINCT w) AS v
       |      FROM (SELECT unnest([a, b]) AS w FROM lmp)),
       |lmsc AS (
       |  SELECT lmp.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    round(avg(-ln((lmc2.c2 + 1) / CAST(lmc1.c1 + lmv.v AS DOUBLE))), 6) AS nll
       |  FROM lmp JOIN lmc2 ON lmp.a = lmc2.a AND lmp.b = lmc2.b
       |           JOIN lmc1 ON lmp.a = lmc1.a, lmv
       |  GROUP BY lmp.doc_id)""".stripMargin

  /** The mojibake-damage plant as a DuckDB CASE expression over `text` —
    * chr() builds the identical code points the Scala literal
    * [[MojiPlant]] carries (DuckDB chr is code-point; Spark's is
    * byte-oriented, which is why the engine side uses the literal).
    */
  private[queries] lazy val duckMojiPlantCase: String =
    // single line: an embedded newline + leading `||` would be eaten by
    // the CONSUMING template's stripMargin (it strips through the first
    // `|` of the operator)
    "CASE WHEN doc_id % 4 = 0 THEN text || ' caf' || chr(195) || " +
      "chr(169) || ' ' || chr(65533) || chr(133) ELSE text END"

  /** The URL plant as a DuckDB CASE expression over `text` — mirrors
    * [[urlPlantedText]].
    */
  private[queries] lazy val duckUrlPlantCase: String =
    // single line — same stripMargin-vs-`||` interaction as above
    "CASE WHEN doc_id % 5 = 0 THEN text || ' see https://www' || " +
      "CAST(doc_id % 7 AS VARCHAR) || '.example' || " +
      "CAST(doc_id % 3 AS VARCHAR) || '.com/page' ELSE text END"

  def oracleSql: Map[String, String] = {
    val W = DupSpanW
    val qT = QualityModel.TrainIters
    Map(
      "quality_gopher_rules" ->
        s"""WITH $duckGopherCtes
           |SELECT doc_id, n_words, mean_word_len, alpha_frac,
           |  top2_frac, top3_frac, top4_frac, dup5_frac, keep
           |FROM gop ORDER BY doc_id""".stripMargin,
      "text_rake_keyphrases" -> {
        val stopList = graft.ext.TextOps.stopwords
          .map(w => s"'$w'").mkString("[", ",", "]")
        s"""WITH rtk AS (SELECT doc_id,
           |    unnest(list_transform(generate_series(1, len(toks)),
           |      i -> struct_pack(pos := i, tok := toks[i]))) AS t
           |  FROM (SELECT doc_id, $duckToks AS toks FROM documents)),
           |rt2 AS (SELECT doc_id, t.pos AS pos, t.tok AS tok,
           |    CASE WHEN list_contains($stopList, t.tok) THEN 1 ELSE 0 END
           |      AS stop
           |  FROM rtk),
           |rpid AS (SELECT doc_id, pos, tok, stop,
           |    CAST(sum(stop) OVER (PARTITION BY doc_id ORDER BY pos)
           |      AS BIGINT) AS pid
           |  FROM rt2),
           |rph AS (SELECT doc_id, pos, tok, pid FROM rpid WHERE stop = 0),
           |rphr AS (SELECT doc_id, pid,
           |    string_agg(tok, ' ' ORDER BY pos) AS phrase,
           |    CAST(count(*) AS BIGINT) AS plen
           |  FROM rph GROUP BY 1, 2 HAVING count(*) <= $RakeMaxLen),
           |rwds AS (SELECT rph.doc_id, rph.pid, rph.tok, rphr.plen
           |  FROM rph JOIN rphr USING (doc_id, pid)),
           |rws AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq,
           |    CAST(sum(plen) AS BIGINT) AS deg
           |  FROM rwds GROUP BY 1),
           |rsc AS (SELECT w.doc_id, w.pid,
           |    CAST(sum(rws.deg * 1000000 // rws.freq) AS BIGINT)
           |      AS score_micro
           |  FROM rwds w JOIN rws USING (tok) GROUP BY 1, 2)
           |SELECT rphr.phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
           |  max(rsc.score_micro) AS score_micro
           |FROM rphr JOIN rsc USING (doc_id, pid)
           |GROUP BY 1 ORDER BY score_micro DESC, phrase
           |LIMIT $RakeTopK""".stripMargin
      },

      "pad_efficiency" ->
        s"""WITH nt AS (SELECT least(CAST(len($duckToks) AS BIGINT),
           |    ${PadLadder.last}) AS nt FROM documents),
           |b AS (SELECT nt, $padBucketSql AS bucket FROM nt),
           |ag AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(nt) AS BIGINT) AS sum_tokens
           |  FROM b GROUP BY 1)
           |SELECT bucket, n_docs, sum_tokens,
           |  n_docs * bucket AS padded_tokens,
           |  (n_docs * bucket - sum_tokens) * 1000000 // (n_docs * bucket)
           |    AS pad_waste_micro
           |FROM ag ORDER BY bucket""".stripMargin,

      "corpus_merkle_roots" -> {
        val sb = new StringBuilder
        sb ++= """m0 AS (SELECT source,
          |    row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
          |      AS idx,
          |    md5(doc_id || ':' || md5(text)) AS h
          |  FROM documents)""".stripMargin
        for (t <- 1 to 20) {
          sb ++= s""",
            |m$t AS (SELECT source, idx // 2 AS idx,
            |    CASE WHEN count(*) = 2 THEN md5(arg_min(h, idx) || arg_max(h, idx))
            |         ELSE arg_min(h, idx) END AS h
            |  FROM m${t - 1} GROUP BY 1, 2)""".stripMargin
        }
        sb ++= """,
          |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n
          |  FROM documents GROUP BY 1)
          |SELECT m20.source, cnt.n AS n_docs, m20.h AS merkle_root
          |FROM m20 JOIN cnt USING (source) ORDER BY source""".stripMargin
        s"WITH ${sb.toString}"
      },

      "source_overlap_matrix" ->
        s"""WITH sth AS (SELECT source,
           |    list_transform($duckToks, tk -> ${duckH32("tk")}) AS th
           |  FROM documents),
           |ssh AS (SELECT DISTINCT source,
           |    unnest(CASE WHEN len(th) < ${Dedup.ShingleN} THEN th
           |      ELSE list_transform(generate_series(1, len(th) - ${Dedup.ShingleN - 1}),
           |        i -> ((((th[i] * ${Dedup.ShingleA} + th[i+1]) % ${Dedup.MinhashP})
           |              * ${Dedup.ShingleA} + th[i+2]) % ${Dedup.MinhashP})) END) AS h
           |  FROM sth),
           |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           |  FROM ssh GROUP BY 1),
           |pr AS (SELECT a.source AS src_a, b.source AS src_b,
           |    CAST(count(*) AS BIGINT) AS shared
           |  FROM ssh a JOIN ssh b ON a.h = b.h AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT src_a, src_b, shared, ta.n AS n_a, tb.n AS n_b,
           |  shared * 1000000 // (ta.n + tb.n - shared) AS jaccard_micro
           |FROM pr JOIN tot ta ON ta.source = src_a
           |        JOIN tot tb ON tb.source = src_b
           |ORDER BY src_a, src_b""".stripMargin,

      "text_winnow" ->
        s"""WITH $duckWinnowSel
           |SELECT doc_id, max(n_kgrams) AS n_kgrams,
           |  max(n_kgrams) - least($WinnowW, max(n_kgrams)) + 1 AS n_windows,
           |  CAST(count(*) AS BIGINT) AS n_fp,
           |  md5(string_agg(fpos || ':' || fh, ',' ORDER BY fpos)) AS fp_digest
           |FROM wsel GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "winnow_match_pairs" ->
        s"""WITH $duckWinnowSel,
           |wfp AS (SELECT doc_id, fh FROM (
           |    SELECT DISTINCT doc_id, fh FROM wsel)
           |  QUALIFY count(*) OVER (PARTITION BY fh) <= $WinnowFreqCap)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(count(*) AS BIGINT) AS n_shared
           |FROM wfp a JOIN wfp b ON a.fh = b.fh AND a.doc_id < b.doc_id
           |GROUP BY 1, 2 HAVING count(*) >= $WinnowMinShared
           |ORDER BY id_a, id_b""".stripMargin,

      "text_longest_repeat" ->
        s"""WITH $duckSuffixes,
           |w AS (
           |  SELECT doc_id, s, lag(s) OVER (PARTITION BY doc_id ORDER BY s) AS p
           |  FROM sfx),
           |l AS (
           |  SELECT doc_id, s,
           |    CASE WHEN p IS NULL THEN 0 ELSE
           |      len(list_filter(generate_series(1, least(len(s), len(p))),
           |                      j -> s[1:j] = p[1:j])) END AS lcp
           |  FROM w),
           |r AS (
           |  SELECT doc_id, lcp,
           |    CASE WHEN lcp = 0 THEN '' ELSE array_to_string(s[1:lcp], ' ')
           |    END AS repeat_str
           |  FROM l),
           |rk AS (
           |  SELECT doc_id, lcp, repeat_str,
           |    row_number() OVER (PARTITION BY doc_id
           |                       ORDER BY lcp DESC, repeat_str ASC) AS rn
           |  FROM r)
           |SELECT doc_id, CAST(lcp AS BIGINT) AS max_repeat_len, repeat_str
           |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin,

      "corpus_top_repeated_spans" ->
        s"""WITH $duckSuffixes,
           |g AS (
           |  SELECT doc_id, s, array_to_string(s[1:2], ' ') AS p2
           |  FROM sfx WHERE len(s) >= 2),
           |w AS (
           |  SELECT doc_id, s, p2, lag(s) OVER (PARTITION BY p2 ORDER BY s) AS p
           |  FROM g),
           |l AS (
           |  SELECT s, p2,
           |    len(list_filter(generate_series(1, least(len(s), len(p))),
           |                    j -> s[1:j] = p[1:j])) AS lcp
           |  FROM w WHERE p IS NOT NULL),
           |spans AS (
           |  SELECT DISTINCT array_to_string(s[1:lcp], ' ') AS span,
           |         lcp AS span_len, p2
           |  FROM l WHERE lcp >= $SpanMinLen),
           |topk AS (SELECT span, span_len, p2 FROM spans
           |         ORDER BY span_len DESC, span ASC LIMIT $SpanTopK),
           |occ AS (
           |  SELECT k.span, k.span_len, count(*) AS n_occurrences,
           |         count(DISTINCT g.doc_id) AS n_docs
           |  FROM topk k JOIN g ON g.p2 = k.p2 AND len(g.s) >= k.span_len
           |                    AND array_to_string(g.s[1:k.span_len], ' ') = k.span
           |  GROUP BY 1, 2)
           |SELECT span, CAST(span_len AS BIGINT) AS span_len,
           |  CAST(n_occurrences AS BIGINT) AS n_occurrences,
           |  CAST(n_docs AS BIGINT) AS n_docs
           |FROM occ ORDER BY span_len DESC, span ASC""".stripMargin,
      "unigram_vocab" ->
        s"""WITH RECURSIVE $duckUnigramBase
           |SELECT CAST(row_number() OVER (ORDER BY usage DESC, piece) - 1
           |            AS INT) AS token_id,
           |  piece, CAST(usage AS BIGINT) AS usage
           |FROM vocabf0 ORDER BY token_id""".stripMargin,

      "span_corrupt" ->
        """WITH t AS (
          |  SELECT doc_id, wpos - 1 AS wpos, tok FROM (
          |    SELECT doc_id,
          |      unnest(string_split_regex(lower(text), '\s+')) AS tok,
          |      generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS wpos
          |    FROM documents) WHERE tok <> ''),
          |b AS (SELECT doc_id, wpos, tok, wpos // 3 AS blk,
          |  substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
          |             CAST(wpos // 3 AS VARCHAR)), 1, 1) < '4' AS masked
          |  FROM t),
          |blocks AS (SELECT doc_id, blk,
          |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY blk) - 1
          |         AS INT) AS k
          |  FROM (SELECT DISTINCT doc_id, blk FROM b WHERE masked)),
          |j AS (SELECT b.doc_id, b.wpos, b.tok, b.blk, blocks.k,
          |    min(b.wpos) OVER (PARTITION BY b.doc_id, b.blk) AS fp
          |  FROM b LEFT JOIN blocks USING (doc_id, blk)),
          |inp AS (SELECT doc_id,
          |    string_agg(CASE WHEN k IS NULL THEN tok
          |                    ELSE '<X' || k || '>' END, ' ' ORDER BY wpos) AS input
          |  FROM j WHERE k IS NULL OR wpos = fp GROUP BY doc_id),
          |tg AS (SELECT doc_id,
          |    string_agg(CASE WHEN wpos = fp THEN '<X' || k || '> ' || tok
          |                    ELSE tok END, ' ' ORDER BY wpos) AS target,
          |    count(*) AS n_masked
          |  FROM j WHERE k IS NOT NULL GROUP BY doc_id),
          |sp AS (SELECT doc_id, count(*) AS n_spans FROM blocks GROUP BY doc_id)
          |SELECT i.doc_id, i.input, coalesce(tg.target, '') AS target,
          |  CAST(coalesce(tg.n_masked, 0) AS BIGINT) AS n_masked_tokens,
          |  CAST(coalesce(sp.n_spans, 0) AS BIGINT) AS n_spans
          |FROM inp i LEFT JOIN tg USING (doc_id) LEFT JOIN sp USING (doc_id)
          |ORDER BY doc_id""".stripMargin,

      "unigram_tokenize" ->
        s"""WITH RECURSIVE $duckUnigramBase,
           |${duckViterbi("r2", "vocabf")},
           |vid AS (SELECT CAST(row_number() OVER (ORDER BY usage DESC, piece)
           |                    - 1 AS INT) AS token_id, piece FROM vocabf0),
           |docwords AS (
           |  SELECT doc_id, wpos, word FROM (
           |    SELECT doc_id,
           |      unnest(string_split_regex(lower(text), '\\s+')) AS word,
           |      generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS wpos
           |    FROM documents) WHERE word <> ''),
           |segw AS (SELECT DISTINCT word FROM r2seg),
           |ids AS (SELECT d.doc_id, d.wpos, p.pos AS ppos,
           |               coalesce(v.token_id, -1) AS tid
           |        FROM docwords d JOIN r2seg p USING (word)
           |        LEFT JOIN vid v ON v.piece = p.piece),
           |unkw AS (SELECT d.doc_id, d.wpos, 1 AS ppos, -1 AS tid
           |         FROM docwords d LEFT JOIN segw s USING (word)
           |         WHERE s.word IS NULL)
           |SELECT doc_id,
           |  array_to_string(list(tid ORDER BY wpos, ppos), ',') AS token_ids
           |FROM (SELECT * FROM ids UNION ALL SELECT * FROM unkw)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "unigram_encode" ->
        s"""WITH RECURSIVE $duckUnigramBase,
           |${duckViterbi("r2", "vocabf")},
           |docwords AS (
           |  SELECT doc_id, wpos, word FROM (
           |    SELECT doc_id,
           |      unnest(string_split_regex(lower(text), '\\s+')) AS word,
           |      generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS wpos
           |    FROM documents) WHERE word <> ''),
           |wordsx AS (SELECT DISTINCT word FROM docwords),
           |segag AS (SELECT word, string_agg(piece, ' ' ORDER BY pos) AS outp,
           |                 count(*) AS np
           |          FROM r2seg GROUP BY word),
           |wp AS (
           |  SELECT w.word, coalesce(s.outp, '<unk>') AS outp,
           |    coalesce(s.np, 1) AS np, s.word IS NULL AS isunk
           |  FROM wordsx w LEFT JOIN segag s USING (word))
           |SELECT d.doc_id,
           |  CAST(sum(w.np) AS BIGINT) AS n_pieces,
           |  CAST(sum(CASE WHEN w.isunk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk_words,
           |  string_agg(w.outp, ' ' ORDER BY d.wpos) AS pieces
           |FROM docwords d JOIN wp w USING (word)
           |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
      "quality_train_weights" ->
        s"""WITH ${duckQualityTrainChain(qT)}
           |SELECT feature, weight FROM (
           |  SELECT 'bias' AS feature, round(b, 6) AS weight FROM w$qT
           |  UNION ALL SELECT 'w_len', round(w1, 6) FROM w$qT
           |  UNION ALL SELECT 'w_punct', round(w2, 6) FROM w$qT
           |  UNION ALL SELECT 'w_stop', round(w3, 6) FROM w$qT)
           |ORDER BY feature""".stripMargin,

      "drift_psi" ->
        s"""WITH tq AS (SELECT doc_id, text, $duckToks AS toks FROM documents),
           |fq AS (SELECT doc_id,
           |  CAST(len(toks) AS DOUBLE) AS nt, CAST(len(text) AS DOUBLE) AS nc,
           |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS np,
           |  CAST(len(list_filter(toks, x -> list_contains(${TextOps.stopwords.map(w => s"'$w'").mkString("[", ",", "]")}, x))) AS DOUBLE) AS ns
           |FROM tq),
           |rawq AS (SELECT doc_id, least(nt / 100.0, 1.0) AS x1, (ns / nt) AS x3,
           |  round(least(nt / 100.0, 1.0) * 0.3 + (1.0 - np / nc) * 0.4 + (ns / nt) * 0.3, 6) AS q
           |FROM fq WHERE nt > 0 AND nc > 0),
           |sp AS (SELECT *,
           |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
           |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
           |       ELSE 'test' END AS split
           |  FROM rawq),
           |longf AS (
           |  SELECT split, 'len' AS feature, x1 AS v FROM sp WHERE split <> 'test'
           |  UNION ALL SELECT split, 'stop', x3 FROM sp WHERE split <> 'test'
           |  UNION ALL SELECT split, 'quality', q FROM sp WHERE split <> 'test'),
           |b AS (SELECT feature, CAST(least(floor(v * 10), 9) AS BIGINT) AS bin, split FROM longf),
           |c AS (SELECT feature, bin,
           |  CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
           |  CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS cv
           |  FROM b GROUP BY feature, bin),
           |grid AS (SELECT f.feature, g.bin
           |  FROM (VALUES ('len'), ('stop'), ('quality')) f(feature),
           |       (SELECT unnest(generate_series(0, 9)) AS bin) g),
           |cc AS (SELECT grid.feature, CAST(grid.bin AS BIGINT) AS bin,
           |  coalesce(ct, 0) AS ct, coalesce(cv, 0) AS cv
           |  FROM grid LEFT JOIN c ON grid.feature = c.feature AND grid.bin = c.bin),
           |tot AS (SELECT feature, CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cv) AS BIGINT) AS nv
           |  FROM cc GROUP BY feature)
           |SELECT cc.feature, cc.bin,
           |  round((CAST(ct AS DOUBLE) + 0.5) / (CAST(nt AS DOUBLE) + 5.0), 6) AS p,
           |  round((CAST(cv AS DOUBLE) + 0.5) / (CAST(nv AS DOUBLE) + 5.0), 6) AS q,
           |  round(((CAST(ct AS DOUBLE) + 0.5) / (CAST(nt AS DOUBLE) + 5.0)
           |         - (CAST(cv AS DOUBLE) + 0.5) / (CAST(nv AS DOUBLE) + 5.0))
           |        * ln(((CAST(ct AS DOUBLE) + 0.5) / (CAST(nt AS DOUBLE) + 5.0))
           |             / ((CAST(cv AS DOUBLE) + 0.5) / (CAST(nv AS DOUBLE) + 5.0))), 6) AS psi
           |FROM cc JOIN tot ON cc.feature = tot.feature
           |ORDER BY cc.feature, cc.bin""".stripMargin,

      "quality_train_scores" ->
        s"""WITH ${duckQualityTrainChain(qT)},
           |zs AS (SELECT f.doc_id,
           |  w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS z
           |  FROM feats f, w$qT w)
           |SELECT doc_id, round(0.5 + 0.5 * (z / (1.0 + abs(z))), 6) AS score,
           |  round(0.5 + 0.5 * (z / (1.0 + abs(z))), 6) >= 0.5 AS keep
           |FROM zs ORDER BY doc_id""".stripMargin,
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

      "dup_span_strip" ->
        s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
          |m AS (
          |  SELECT doc_id, toks,
          |    list_transform(toks, tk -> ${duckH32("tk")}) AS th,
          |    len(toks) AS n,
          |    CASE WHEN len(toks) < $W THEN 1 ELSE $W END AS effw
          |  FROM tok),
          |w AS (
          |  SELECT doc_id, effw, unnest(CASE WHEN n < $W
          |    THEN list_transform(generate_series(1, n),
          |           i -> struct_pack(pos := i, h := th[i]))
          |    ELSE list_transform(generate_series(1, n - ${W - 1}),
          |           i -> struct_pack(pos := i, h := list_reduce(th[i:i+${W - 1}],
          |                  (a, b) -> (a * ${Dedup.ShingleA} + b) % ${Dedup.MinhashP}))) END) AS wh
          |  FROM m),
          |w2 AS (SELECT doc_id, effw, wh.pos AS pos, wh.h AS h FROM w),
          |dup AS (SELECT h FROM (
          |  SELECT h, count(DISTINCT doc_id) AS ndoc FROM w2 GROUP BY h) WHERE ndoc > 1),
          |rem AS (SELECT DISTINCT doc_id, tpos FROM (
          |  SELECT doc_id, unnest(generate_series(pos, pos + effw - 1)) AS tpos
          |  FROM w2 WHERE h IN (SELECT h FROM dup))),
          |tp AS (SELECT doc_id, unnest(list_transform(generate_series(1, n),
          |         i -> struct_pack(tpos := i, tk := toks[i]))) AS t
          |       FROM m),
          |t2 AS (SELECT doc_id, t.tpos AS tpos, t.tk AS tk FROM tp),
          |kept AS (SELECT t2.doc_id, t2.tpos, t2.tk FROM t2
          |  WHERE NOT EXISTS (SELECT 1 FROM rem
          |    WHERE rem.doc_id = t2.doc_id AND rem.tpos = t2.tpos)),
          |rec AS (SELECT doc_id, count(*) AS n_kept,
          |          string_agg(tk, ' ' ORDER BY tpos) AS clean_text
          |        FROM kept GROUP BY doc_id)
          |SELECT m.doc_id, CAST(m.n AS BIGINT) AS n_tokens,
          |  CAST(coalesce(rec.n_kept, 0) AS BIGINT) AS n_kept,
          |  coalesce(rec.clean_text, '') AS clean_text
          |FROM m LEFT JOIN rec USING (doc_id) ORDER BY m.doc_id""".stripMargin,

      "lm_trigram_score" ->
        s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
          |tr AS (SELECT doc_id, t.a AS a, t.b AS b, t.c AS c FROM (
          |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
          |    i -> struct_pack(a := toks[i], b := toks[i+1], c := toks[i+2]))) AS t
          |  FROM tok WHERE len(toks) >= 3)),
          |bi AS (SELECT p.x AS x, p.y AS y FROM (
          |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
          |    i -> struct_pack(x := toks[i], y := toks[i+1]))) AS p
          |  FROM tok WHERE len(toks) >= 2)),
          |c3 AS MATERIALIZED (SELECT a, b, c, CAST(count(*) AS BIGINT) AS c3
          |  FROM tr GROUP BY 1, 2, 3),
          |c2 AS MATERIALIZED (SELECT x, y, CAST(count(*) AS BIGINT) AS c2
          |  FROM bi GROUP BY 1, 2),
          |c1 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS c1
          |  FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY 1),
          |nt AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM c1),
          |sc AS MATERIALIZED (SELECT c3.a, c3.b, c3.c,
          |    0.6 * (c3.c3 * 1.0 / ab.c2) + 0.3 * (bc.c2 * 1.0 / cb.c1)
          |      + 0.1 * (cc.c1 * 1.0 / nt.n) AS p
          |  FROM c3 JOIN c2 ab ON ab.x = c3.a AND ab.y = c3.b
          |         JOIN c2 bc ON bc.x = c3.b AND bc.y = c3.c
          |         JOIN c1 cb ON cb.w = c3.b
          |         JOIN c1 cc ON cc.w = c3.c, nt)
          |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
          |  round(avg(-ln(sc.p)), 6) AS nll
          |FROM tr JOIN sc ON tr.a = sc.a AND tr.b = sc.b AND tr.c = sc.c
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "text_pmi_topk" ->
        s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
          |uc AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS c
          |  FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY 1),
          |pc0 AS MATERIALIZED (SELECT bg.a AS w1, bg.b AS w2,
          |    CAST(count(*) AS BIGINT) AS c12
          |  FROM (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
          |          i -> struct_pack(a := toks[i], b := toks[i+1]))) AS bg
          |        FROM tok WHERE len(toks) >= 2)
          |  GROUP BY 1, 2),
          |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
          |nb AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM pc0)
          |SELECT p.w1, p.w2, p.c12,
          |  CAST(round(ln((p.c12 * 1.0 / nb.nb) /
          |      ((u1.c * 1.0 / nt.n) * (u2.c * 1.0 / nt.n))) * 1000000, 0)
          |    AS BIGINT) AS pmi_micro
          |FROM pc0 p
          |JOIN uc u1 ON u1.w = p.w1 JOIN uc u2 ON u2.w = p.w2, nt, nb
          |WHERE p.c12 >= $PmiMinCount
          |ORDER BY pmi_micro DESC, p.w1, p.w2 LIMIT $PmiTopK""".stripMargin,

      "lm_bigram_score" ->
        s"""WITH $duckLmNllCtes
          |SELECT doc_id, n_bigrams, nll FROM lmsc ORDER BY doc_id""".stripMargin,

      "pii_scan_redact" -> {
        val email = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
        val ip = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
        val phone = """\b\d{3}-\d{3}-\d{4}\b"""
        val acct = """\b\d{9,}\b"""
        s"""WITH planted AS (
          |  SELECT doc_id,
          |    CASE WHEN doc_id % 3 = 0 THEN text
          |      || ' contact user' || CAST(doc_id AS VARCHAR)
          |      || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
          |      || '.' || CAST(doc_id % 100 AS VARCHAR)
          |      || ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          |      || ' acct ' || lpad(CAST(doc_id % 1000000000 AS VARCHAR), 9, '0')
          |    ELSE text END AS text
          |  FROM documents)
          |SELECT doc_id,
          |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
          |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
          |  CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phones,
          |  CAST(len(regexp_extract_all(text, '$acct')) AS BIGINT) AS n_ids,
          |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          |    text, '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
          |    '$phone', '<PHONE>', 'g'), '$acct', '<ID>', 'g')) AS redacted_md5
          |FROM planted ORDER BY doc_id""".stripMargin
      },

      "lm_kneser_ney" ->
        s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
          |bg AS (
          |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
          |    i -> struct_pack(a := toks[i], b := toks[i+1]))) AS bg
          |  FROM tok WHERE len(toks) >= 2),
          |bp AS (SELECT doc_id, bg.a AS a, bg.b AS b FROM bg),
          |c2 AS (SELECT a, b, count(*) AS c2 FROM bp GROUP BY a, b),
          |c1 AS (SELECT a, sum(c2) AS c1, count(*) AS n1p FROM c2 GROUP BY a),
          |ctn AS (SELECT b, count(*) AS nl FROM c2 GROUP BY b),
          |tt AS (SELECT count(*) AS nt FROM c2),
          |p AS (SELECT c2.a, c2.b,
          |    -ln(greatest(CAST(c2.c2 AS DOUBLE) - $KnDiscount, 0.0) / c1.c1
          |        + $KnDiscount * c1.n1p / c1.c1
          |        * (CAST(ctn.nl AS DOUBLE) / nt)) AS nllw
          |  FROM c2 JOIN c1 USING (a) JOIN ctn USING (b), tt)
          |SELECT bp.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          |  round(avg(nllw), 6) AS nll_kn
          |FROM bp JOIN p ON bp.a = p.a AND bp.b = p.b
          |GROUP BY bp.doc_id ORDER BY bp.doc_id""".stripMargin,

      // Modified-KN trigram mirror: same statistic tables (trigram
      // types, per-context count-class histograms, bigram continuation
      // counts, unigram continuation), same nullif-guarded clamped
      // discount triples, the probability tree spelled token-for-token
      // like the Spark expr strings.
      "lm_kneser_ney_tri" ->
        s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
          |tg AS (
          |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
          |    i -> struct_pack(a := toks[i], b := toks[i+1], c := toks[i+2]))) AS tg
          |  FROM tok WHERE len(toks) >= 3),
          |tp AS (SELECT doc_id, tg.a AS a, tg.b AS b, tg.c AS c FROM tg),
          |c3 AS (SELECT a, b, c, count(*) AS c3 FROM tp GROUP BY 1, 2, 3),
          |hi AS (SELECT a, b, sum(c3) AS cab,
          |    sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS h1,
          |    sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS h2,
          |    sum(CASE WHEN c3 >= 3 THEN 1 ELSE 0 END) AS h3
          |  FROM c3 GROUP BY 1, 2),
          |coc3 AS (SELECT
          |    sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS n1,
          |    sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS n2,
          |    sum(CASE WHEN c3 = 3 THEN 1 ELSE 0 END) AS n3,
          |    sum(CASE WHEN c3 = 4 THEN 1 ELSE 0 END) AS n4
          |  FROM c3),
          |cc2 AS (SELECT b, c, count(*) AS cc FROM c3 GROUP BY 1, 2),
          |mid AS (SELECT b, sum(cc) AS cb,
          |    sum(CASE WHEN cc = 1 THEN 1 ELSE 0 END) AS k1,
          |    sum(CASE WHEN cc = 2 THEN 1 ELSE 0 END) AS k2,
          |    sum(CASE WHEN cc >= 3 THEN 1 ELSE 0 END) AS k3
          |  FROM cc2 GROUP BY 1),
          |coc2 AS (SELECT
          |    sum(CASE WHEN cc = 1 THEN 1 ELSE 0 END) AS m1,
          |    sum(CASE WHEN cc = 2 THEN 1 ELSE 0 END) AS m2,
          |    sum(CASE WHEN cc = 3 THEN 1 ELSE 0 END) AS m3,
          |    sum(CASE WHEN cc = 4 THEN 1 ELSE 0 END) AS m4
          |  FROM cc2),
          |cu AS (SELECT c, count(*) AS cuc FROM cc2 GROUP BY 1),
          |nbt AS (SELECT count(*) AS nbt FROM cc2),
          |d3t AS (SELECT n1, n2, n3, n4,
          |    coalesce(CAST(n1 AS DOUBLE) / nullif(n1 + 2 * n2, 0), 0.5) AS y3
          |  FROM coc3),
          |dd AS (SELECT
          |    greatest(0.0, least(1.0,
          |      1.0 - 2.0 * y3 * coalesce(CAST(n2 AS DOUBLE) / nullif(n1, 0), 0.0))) AS d1,
          |    greatest(0.0, least(2.0,
          |      2.0 - 3.0 * y3 * coalesce(CAST(n3 AS DOUBLE) / nullif(n2, 0), 0.0))) AS d2,
          |    greatest(0.0, least(3.0,
          |      3.0 - 4.0 * y3 * coalesce(CAST(n4 AS DOUBLE) / nullif(n3, 0), 0.0))) AS d3
          |  FROM d3t),
          |d2t AS (SELECT m1, m2, m3, m4,
          |    coalesce(CAST(m1 AS DOUBLE) / nullif(m1 + 2 * m2, 0), 0.5) AS y2
          |  FROM coc2),
          |ee AS (SELECT
          |    greatest(0.0, least(1.0,
          |      1.0 - 2.0 * y2 * coalesce(CAST(m2 AS DOUBLE) / nullif(m1, 0), 0.0))) AS e1,
          |    greatest(0.0, least(2.0,
          |      2.0 - 3.0 * y2 * coalesce(CAST(m3 AS DOUBLE) / nullif(m2, 0), 0.0))) AS e2,
          |    greatest(0.0, least(3.0,
          |      3.0 - 4.0 * y2 * coalesce(CAST(m4 AS DOUBLE) / nullif(m3, 0), 0.0))) AS e3
          |  FROM d2t),
          |p AS (SELECT c3.a, c3.b, c3.c,
          |    -ln(greatest(CAST(c3.c3 AS DOUBLE) - (CASE WHEN c3.c3 = 1 THEN d1
          |          WHEN c3.c3 = 2 THEN d2 ELSE d3 END), 0.0) / cab
          |        + (d1 * h1 + d2 * h2 + d3 * h3) / cab
          |        * (greatest(CAST(cc AS DOUBLE) - (CASE WHEN cc = 1 THEN e1
          |              WHEN cc = 2 THEN e2 ELSE e3 END), 0.0) / cb
          |           + (e1 * k1 + e2 * k2 + e3 * k3) / cb
          |           * (CAST(cuc AS DOUBLE) / nbt))) AS nllw
          |  FROM c3 JOIN hi USING (a, b) JOIN cc2 USING (b, c)
          |       JOIN mid USING (b) JOIN cu USING (c), dd, ee, nbt)
          |SELECT tp.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
          |  round(avg(nllw), 6) AS nll_mkn
          |FROM tp JOIN p ON tp.a = p.a AND tp.b = p.b AND tp.c = p.c
          |GROUP BY tp.doc_id ORDER BY tp.doc_id""".stripMargin,

      // Rank-based perplexity gate: the SHARED lm_bigram chain
      // (duckLmNllCtes — one definition, no drift between the gate's
      // mirror and the LM recipe), then a per-lang window over the
      // doc-sized score frame; the keep cut is integer cross-multiplied
      // on the ROUNDED nll ranking (ties by doc_id).
      "corpus_ppl_filter" ->
        s"""WITH $duckLmNllCtes,
          |r AS (SELECT lmsc.doc_id, d.lang, lmsc.nll,
          |    row_number() OVER (PARTITION BY d.lang
          |      ORDER BY lmsc.nll, lmsc.doc_id) AS rn,
          |    count(*) OVER (PARTITION BY d.lang) AS n
          |  FROM lmsc JOIN documents d ON d.doc_id = lmsc.doc_id)
          |SELECT doc_id, lang, nll, rn * 5 <= n * 4 AS keep
          |FROM r ORDER BY doc_id""".stripMargin,

      // Mojibake mirror: DuckDB chr() is code-point (unlike Spark's
      // byte-oriented chr), so the plant string is rebuilt here from the
      // same code points the Scala literal carries; detector patterns
      // are the identical RE2/Java-compatible literals.
      "text_mojibake_flags" ->
        s"""WITH planted AS (
          |  SELECT doc_id, $duckMojiPlantCase AS text
          |  FROM documents)
          |SELECT doc_id,
          |  CAST(len(regexp_extract_all(text, '$MojiReplPat')) AS BIGINT)
          |    AS n_repl,
          |  CAST(len(regexp_extract_all(text, '$MojiC1Pat')) AS BIGINT)
          |    AS n_c1,
          |  CAST(len(regexp_extract_all(text, '$MojiLatin1Pat')) AS BIGINT)
          |    AS n_mojibake,
          |  len(regexp_extract_all(text, '$MojiReplPat'))
          |    + len(regexp_extract_all(text, '$MojiC1Pat'))
          |    + len(regexp_extract_all(text, '$MojiLatin1Pat')) = 0 AS keep
          |FROM planted ORDER BY doc_id""".stripMargin,

      // Mirrors TextOps feature extraction exactly (same fragments the
      // text_quality_score oracle uses), then the fixed-weight sigmoid.
      "quality_logistic" ->
        s"""WITH t AS (SELECT doc_id, text, $duckToks AS toks FROM documents),
          |f AS (SELECT doc_id,
          |  CAST(len(toks) AS DOUBLE) AS nt, CAST(len(text) AS DOUBLE) AS nc,
          |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS np,
          |  CAST(len(list_filter(toks, x -> list_contains(${TextOps.stopwords.map(w => s"'$w'").mkString("[", ",", "]")}, x))) AS DOUBLE) AS ns
          |  FROM t),
          |z AS (SELECT doc_id,
          |  $QlBias + $QlLen * least(nt / 100.0, 1.0)
          |    + $QlPunct * (1.0 - np / nc) + $QlStop * (ns / nt) AS z
          |  FROM f)
          |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score,
          |  round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
          |FROM z ORDER BY doc_id""".stripMargin,

      "corpus_split" ->
        """SELECT doc_id,
          |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
          |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
          |       ELSE 'test' END AS split
          |FROM documents ORDER BY doc_id""".stripMargin,

      "text_url_domains" ->
        s"""WITH planted AS (
          |  SELECT doc_id, $duckUrlPlantCase AS text
          |  FROM documents),
          |u AS (SELECT doc_id,
          |    unnest(regexp_extract_all(text, 'https?://([a-z0-9.-]+)', 1))
          |      AS domain
          |  FROM planted)
          |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
          |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          |FROM u GROUP BY domain ORDER BY domain""".stripMargin,

      "shard_mix_entropy" ->
        """WITH t AS (SELECT source,
          |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch1'),
          |      1, 2))::INTEGER % 8 AS INTEGER) AS shard
          |  FROM documents),
          |cells AS (SELECT shard, source, count(*) AS c
          |  FROM t GROUP BY 1, 2),
          |wn AS (SELECT shard, source, c,
          |    CAST(sum(c) OVER (PARTITION BY shard) AS BIGINT) AS n
          |  FROM cells),
          |tm AS (SELECT shard, n,
          |    CAST(round(-(CAST(c AS DOUBLE) / n)
          |      * ln(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT) AS term_micro
          |  FROM wn)
          |SELECT shard, max(n) AS n_docs,
          |  CAST(count(*) AS BIGINT) AS n_sources,
          |  CAST(sum(term_micro) AS DOUBLE) / 1000000.0 AS entropy
          |FROM tm GROUP BY shard ORDER BY shard""".stripMargin,

      "corpus_shuffle_shards" ->
        """WITH t AS (SELECT doc_id,
          |  md5(CAST(doc_id AS VARCHAR) || ':epoch1') AS h FROM documents),
          |b AS (SELECT doc_id, h,
          |  CAST(('0x' || substr(h, 1, 2))::INTEGER % 8 AS INTEGER) AS shard
          |  FROM t)
          |SELECT doc_id, shard,
          |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
          |       AS BIGINT) AS pos
          |FROM b ORDER BY shard, pos""".stripMargin,

      "corpus_heaps_law" ->
        s"""WITH prm AS (SELECT greatest(1, (count(*) + $HeapsBuckets - 1) // $HeapsBuckets) AS bw
           |  FROM documents),
           |t AS (SELECT doc_id, $duckToks AS toks FROM documents),
           |u AS (SELECT doc_id, unnest(toks) AS tk FROM t),
           |ntok AS (SELECT doc_id // (SELECT bw FROM prm) AS bucket,
           |    CAST(count(*) AS BIGINT) AS n_tok
           |  FROM u GROUP BY 1),
           |fs AS (SELECT tk, min(doc_id) AS fd FROM u GROUP BY 1),
           |ntyp AS (SELECT fd // (SELECT bw FROM prm) AS bucket,
           |    CAST(count(*) AS BIGINT) AS n_new
           |  FROM fs GROUP BY 1)
           |SELECT n.bucket,
           |  CAST(sum(n.n_tok) OVER (ORDER BY n.bucket
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
           |  CAST(sum(coalesce(y.n_new, 0)) OVER (ORDER BY n.bucket
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
           |FROM ntok n LEFT JOIN ntyp y USING (bucket)
           |ORDER BY bucket""".stripMargin,

      "event_transitions" ->
        """WITH p AS (
          |  SELECT user_id, event_type,
          |    lag(event_type) OVER (PARTITION BY user_id
          |                          ORDER BY epoch_ms(ts), event_id) AS prev_type
          |  FROM events),
          |q AS (SELECT prev_type, event_type AS next_type FROM p
          |      WHERE prev_type IS NOT NULL),
          |c2 AS (SELECT prev_type, next_type, count(*) AS n FROM q GROUP BY 1, 2),
          |c1 AS (SELECT prev_type, count(*) AS n_prev FROM q GROUP BY 1)
          |SELECT c2.prev_type, c2.next_type, CAST(c2.n AS BIGINT) AS n,
          |  round(c2.n / CAST(c1.n_prev AS DOUBLE), 6) AS p_next
          |FROM c2 JOIN c1 USING (prev_type)
          |ORDER BY prev_type, next_type""".stripMargin,

      "anomaly_zscore" ->
        """WITH e AS (
          |  SELECT event_id, event_type, epoch_ms(ts) // 1000 AS sec, value
          |  FROM events),
          |w AS (
          |  SELECT event_id, event_type,
          |    count(*) OVER win AS n_trail,
          |    avg(value) OVER win AS mu,
          |    stddev_samp(value) OVER win AS sd,
          |    value
          |  FROM e
          |  WINDOW win AS (PARTITION BY event_type ORDER BY sec
          |                 RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING))
          |SELECT event_id, event_type, CAST(n_trail AS BIGINT) AS n_trail,
          |  round((value - mu) / sd, 6) AS z
          |FROM w
          |WHERE n_trail >= 5 AND sd > 0
          |  AND abs(round((value - mu) / sd, 6)) > 2.5
          |ORDER BY event_id""".stripMargin,

      "pipeline_curriculum" ->
        s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
          |bg AS (
          |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
          |    i -> struct_pack(a := toks[i], b := toks[i+1]))) AS bg
          |  FROM tok WHERE len(toks) >= 2),
          |p AS (SELECT doc_id, bg.a AS a, bg.b AS b FROM bg),
          |c2 AS (SELECT a, b, count(*) AS c2 FROM p GROUP BY a, b),
          |c1 AS (SELECT a, count(*) AS c1 FROM p GROUP BY a),
          |v AS (SELECT count(DISTINCT w) AS v
          |      FROM (SELECT unnest([a, b]) AS w FROM p)),
          |sc AS (SELECT p.doc_id,
          |  round(avg(-ln((c2.c2 + 1) / CAST(c1.c1 + v.v AS DOUBLE))), 6) AS nll
          |  FROM p JOIN c2 ON p.a = c2.a AND p.b = c2.b
          |         JOIN c1 ON p.a = c1.a, v
          |  GROUP BY p.doc_id),
          |meta AS (SELECT doc_id, lang,
          |  CAST(len($duckToks) AS BIGINT) AS nt FROM documents),
          |sm AS (SELECT sc.doc_id, meta.lang, sc.nll, meta.nt
          |       FROM sc JOIN meta USING (doc_id)),
          |q AS (SELECT lang, quantile_cont(nll, 0.25) AS q1,
          |             quantile_cont(nll, 0.75) AS q3
          |      FROM sm GROUP BY lang),
          |b AS (SELECT sm.lang,
          |  CASE WHEN nll <= q1 THEN 'easy'
          |       WHEN nll <= q3 THEN 'medium' ELSE 'hard' END AS bucket, nt
          |  FROM sm JOIN q USING (lang)),
          |cells AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(nt) AS BIGINT) AS token_mass FROM b GROUP BY 1, 2),
          |tot AS (SELECT CAST(sum(token_mass) AS BIGINT) AS tm, count(*) AS nc
          |        FROM cells)
          |SELECT lang, bucket, n_docs, token_mass,
          |  round(CAST(tm AS DOUBLE) / nc / token_mass, 6) AS weight
          |FROM cells, tot ORDER BY lang, bucket""".stripMargin,

      "cdc_chunks" ->
        s"""WITH $duckCdcChunks
           |SELECT doc_id, chunk_id, n_toks, chunk_hash FROM ch
           |ORDER BY doc_id, chunk_id""".stripMargin,

      "cdc_dedup_ratio" ->
        s"""WITH $duckCdcChunks,
           |nd AS (SELECT chunk_hash, count(DISTINCT doc_id) AS ndoc
           |       FROM ch GROUP BY 1)
           |SELECT ch.doc_id, CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           |  CAST(count(*) AS BIGINT) AS n_chunks,
           |  CAST(sum(CASE WHEN ndoc > 1 THEN n_toks ELSE 0 END) AS BIGINT) AS dup_tokens,
           |  round(CAST(sum(CASE WHEN ndoc > 1 THEN n_toks ELSE 0 END) AS DOUBLE)
           |        / sum(n_toks), 6) AS dup_ratio
           |FROM ch JOIN nd USING (chunk_hash)
           |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin)
  }

  /** Oracle replay of Dedup.cdcChunks: positions + hashes unnested in
    * parallel, chunk id = running count of earlier boundary tokens,
    * chunk hash = list_reduce Horner (seeded with the first element —
    * the same semantics the engine spells with aggregate over a slice).
    */
  private def duckCdcChunks: String =
    s"""th AS (
       |  SELECT doc_id, list_transform($duckToks, tk -> ${duckH32("tk")}) AS th
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, unnest(generate_series(1, len(th))) AS pos,
       |         unnest(th) AS h
       |  FROM th),
       |c AS (
       |  SELECT doc_id, pos, h,
       |    coalesce(sum(CASE WHEN h % ${graft.ext.Dedup.CdcMask} = 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
       |  FROM p),
       |ch AS (
       |  SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
       |    CAST(count(*) AS BIGINT) AS n_toks,
       |    list_reduce(list(h ORDER BY pos),
       |      (a, b) -> (a * ${graft.ext.Dedup.ShingleA} + b) % ${graft.ext.Dedup.MinhashP}) AS chunk_hash
       |  FROM c GROUP BY doc_id, cid)""".stripMargin
}
