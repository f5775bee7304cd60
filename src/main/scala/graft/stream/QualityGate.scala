package graft.stream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Streaming quality gate — the PERCOLATION twin of the batch cleaning
  * pipeline ([[graft.ext.Retrieval.percolate]] pattern applied to the
  * Gopher rules + the bigram-LM perplexity gate): score each INCOMING
  * document against FROZEN corpus statistics, as a pure per-row
  * projection. No aggregation, no state store, no watermark — the gate
  * shards freely over a 100 TB/day firehose, and a streamed document
  * scores bit-identically to the same gate applied to a batch frame
  * (spec-proved, `QualityGateSpec`).
  *
  * Frozen constants (the standing-query payload):
  *  - the per-bigram smoothed NLL table + unigram counts + vocabulary
  *    size from [[graft.queries.CorpusQueries.lmModelTables]] — exactly
  *    the table the batch `lm_bigram_score` joins against. At fixture
  *    scale the full table ships (the spec's bit-identity needs it); at
  *    corpus scale [[freeze]] takes `topK` and keeps only the K most
  *    frequent bigrams, letting the smoothing fallback absorb the tail —
  *    same trade as percolate's query-vocabulary restriction (measured
  *    deviation in `QualityGateSpec`);
  *  - the per-language NLL admission thresholds read off the batch
  *    perplexity cut (the max admitted NLL per language — a
  *    languages-sized constant). TIE SEMANTICS, by design: the stream
  *    gate admits any document whose NLL EQUALS the per-language cut
  *    value (`nll <= thr`), while the batch rank cut breaks NLL ties by
  *    doc_id and may reject some tied docs to hit its exact 80% count —
  *    a stream processor sees one document at a time and cannot know
  *    how many ties the batch quota would have admitted, so ≥-at-tie
  *    admission (never dropping a document the batch would keep) is the
  *    intended streaming semantics, not an approximation bug. Off ties
  *    the two gates are bit-identical (spec-proved);
  *  - the Gopher thresholds (pure literals).
  *
  * The Gopher metrics are recomputed per row from the document's own
  * token array — integer run-length folds over sorted in-row gram
  * arrays — so every fraction is the SAME integer ratio the batch
  * (doc, gram)-shuffle aggregation produces, rounded identically:
  * bit-identity is arithmetic, not luck. (HOF folds run interpreted —
  * acceptable here because each array is one document, the same §8
  * allowance percolate uses; the native-kernel upgrade is mechanical if
  * a profile ever demands it.)
  */
object QualityGate {

  /** Frozen bigram LM: seen-bigram NLL (key = "a b"), unigram
    * continuation counts, and the vocabulary size for the smoothing
    * fallback on unseen bigrams: -ln((0+1)/(c1(a)+V)).
    */
  final case class FrozenLm(nll: Map[String, Double], c1: Map[String, Long],
      v: Long)

  /** Collect the frozen model from a corpus directory.
    *
    * `topK` bounds the frozen bigram table to the K most frequent
    * bigrams (by corpus count, deterministic ties by (a, b)): the full
    * table is bigram-TYPE-sized — vocabulary², the one frozen constant
    * that grows superlinearly with the corpus — so an unbounded freeze
    * is a driver OOM and a multi-GB task closure at real corpus scale.
    * Dropping a bigram moves its score from the seen path
    * -ln((c2+1)/(c1(a)+V)) to the smoothing fallback -ln(1/(c1(a)+V)) —
    * a shift of +ln(c2+1) per occurrence, so the bounded gate is
    * MONOTONE-CONSERVATIVE (NLL only rises; it admits a subset of the
    * full model's admissions, never extra junk — spec-proved) and its
    * admission deviation is governed by the OCCURRENCE COVERAGE of the
    * kept K, not by K itself: size K so the kept bigrams cover ~all
    * token occurrences (cheap under a Zipf bigram law — real corpora)
    * and the per-doc shift vanishes. `QualityGateSpec` measures the
    * WORST case on the near-uniform synthetic fixture (top-half K =
    * only ~0.59 occurrence coverage → a pinned 238/500 keep→drop
    * tightening, zero spurious admissions) and the identity at K =
    * full. Frozen payload bound: K × (avg bigram key bytes + 8) for
    * the NLL map, plus the unigram c1 map and per-lang thresholds —
    * both LINEAR in vocabulary/languages, which is why only the bigram
    * table takes a K. Default keeps everything (the spec's bit-identity
    * path).
    */
  def freeze(s: SparkSession, corpusDir: String,
      topK: Int = Int.MaxValue): FrozenLm = {
    val (nll, c1, v) = graft.queries.CorpusQueries.lmModelTables(s, corpusDir)
    val bounded =
      if (topK == Int.MaxValue) nll
      else nll.orderBy(col("c2").desc, col("a"), col("b")).limit(topK)
    val nllMap = bounded.select(col("a"), col("b"), col("nllw")).collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}" -> r.getDouble(2)).toMap
    val c1Map = c1.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    FrozenLm(nllMap, c1Map, v)
  }

  /** Per-language NLL admission thresholds from the batch perplexity
    * cut: the max NLL among the documents the rank cut keeps.
    */
  def freezeThresholds(s: SparkSession, corpusDir: String): Map[String, Double] =
    graft.queries.CorpusQueries.pplRanked(s, corpusDir)
      .where(col("keep"))
      .groupBy(col("lang")).agg(max(col("nll")).as("thr"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** In-row n-gram string array (doc order) — the per-row twin of the
    * batch explode+concat staging.
    */
  private def gramArray(toks: Column, n: Int): Column = {
    val ln = greatest(size(toks) - (n - 1), lit(0))
    transform(
      arrays_zip((1 to n).map(k => slice(toks, lit(k), ln)): _*),
      g => concat_ws(" ", (0 until n).map(i => g(i.toString)): _*))
  }

  /** One run-length fold over a SORTED gram array →
    * struct(top_tc, dup_tc): top_tc = count·length of the most frequent
    * gram (ties → lexicographically smallest, like the batch
    * `ORDER BY cnt DESC, g` row_number), dup_tc = Σ count·length over
    * grams with count > 1 (the duplicated-5-gram mass). All integer.
    */
  private def runStats(sortedGrams: Column): Column = {
    def closed(st: Column) = {
      val better = st("cnt") > st("bestc")
      struct(
        when(better, st("cnt")).otherwise(st("bestc")).as("bestc"),
        when(better, st("prev")).otherwise(st("bestg")).as("bestg"),
        (st("dup") + when(st("cnt") > 1,
          st("cnt") * length(st("prev")).cast("long")).otherwise(lit(0L)))
          .as("dup"))
    }
    aggregate(sortedGrams,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("cnt"),
        lit(0L).as("bestc"), lit(null).cast("string").as("bestg"),
        lit(0L).as("dup")),
      (st, g) => {
        val c = closed(st)
        when(g === st("prev"),
          struct(st("prev").as("prev"), (st("cnt") + 1).as("cnt"),
            st("bestc").as("bestc"), st("bestg").as("bestg"),
            st("dup").as("dup")))
          .otherwise(
            struct(g.as("prev"), lit(1L).as("cnt"),
              c("bestc").as("bestc"), c("bestg").as("bestg"),
              c("dup").as("dup")))
      },
      st => {
        val c = closed(st)
        struct(
          (c("bestc") * coalesce(length(c("bestg")).cast("long"), lit(0L)))
            .as("top_tc"),
          c("dup").as("dup_tc"))
      })
  }

  private def frac(x: Column, den: Column): Column =
    round(x.cast("double") / nullif(den, lit(0L)), 6)

  /** The gate: a pure per-row projection over (doc_id, lang, text) rows
    * — batch frame or unbounded stream alike. Emits the Gopher metric
    * columns (bit-identical to [[graft.queries.CorpusQueries
    * .gopherMetrics]]), the bigram-LM score under the frozen model
    * (n_bigrams, nll — null for sub-2-token docs, which the batch LM
    * cannot score either), and the composed admission flag
    * `keep = gopher_keep AND nll ≤ threshold(lang)`.
    *
    * `passthrough` names input columns to carry into the output
    * unchanged (e.g. `text`/`ts` when the gate feeds the streaming
    * dedup stages downstream — `ComposedStreamSpec`'s ingest pipeline).
    * Passthrough names must be disjoint from the gate's own input and
    * output columns (doc_id, lang, nll, keep, ...) — a collision would
    * duplicate the column in both selects and surface downstream as an
    * ambiguous-reference failure or a duplicate-named schema (r12
    * advice), so it is rejected eagerly here with the offending names.
    */
  def gate(docs: DataFrame, lm: FrozenLm, thr: Map[String, Double],
      passthrough: Seq[String] = Nil): DataFrame = {
    // "text" is absent on purpose: the gate CONSUMES it without emitting
    // it, so passing it through is legal (ComposedStreamSpec's pipeline
    // feeds the survivor text to the dedup stages downstream)
    val reserved = Set("doc_id", "lang", "nc", "_toks", "n_words",
      "_sl", "_na", "_t2", "_t3", "_t4", "_d5", "mean_word_len",
      "alpha_frac", "top2_frac", "top3_frac", "top4_frac", "dup5_frac",
      "gopher_keep", "_nlls", "n_bigrams", "nll", "lm_keep", "keep")
    val clash = passthrough.filter(reserved.contains)
    require(clash.isEmpty,
      s"QualityGate.gate: passthrough column(s) ${clash.mkString(", ")} " +
        "collide with the gate's own input/output columns")
    val nllLit = typedlit(lm.nll)
    val c1Lit = typedlit(lm.c1)
    val thrLit = typedlit(thr)
    val staged = docs.select(col("doc_id") +: col("lang") +:
      length(col("text")).cast("long").as("nc") +:
      TextOps.tokens(col("text")).as("_toks") +:
      passthrough.map(col): _*)
    val withWords = staged
      .withColumn("n_words", size(col("_toks")).cast("long"))
      .withColumn("_sl", aggregate(col("_toks"), lit(0L),
        (a, t) => a + length(t).cast("long")))
      .withColumn("_na",
        size(filter(col("_toks"), t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("_t2", runStats(sort_array(gramArray(col("_toks"), 2))))
      .withColumn("_t3", runStats(sort_array(gramArray(col("_toks"), 3))))
      .withColumn("_t4", runStats(sort_array(gramArray(col("_toks"), 4))))
      .withColumn("_d5", runStats(sort_array(gramArray(col("_toks"), 5))))
    val gophered = withWords
      .withColumn("mean_word_len", frac(col("_sl"), col("n_words")))
      .withColumn("alpha_frac", frac(col("_na"), col("n_words")))
      .withColumn("top2_frac", frac(col("_t2")("top_tc"), col("nc")))
      .withColumn("top3_frac", frac(col("_t3")("top_tc"), col("nc")))
      .withColumn("top4_frac", frac(col("_t4")("top_tc"), col("nc")))
      .withColumn("dup5_frac", frac(col("_d5")("dup_tc"), col("nc")))
      .withColumn("gopher_keep",
        col("n_words").between(graft.queries.CorpusQueries.GopherMinWords,
            graft.queries.CorpusQueries.GopherMaxWords) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("alpha_frac") >= 0.8 &&
          col("top2_frac") <= 0.2 && col("top3_frac") <= 0.18 &&
          col("top4_frac") <= 0.16 && col("dup5_frac") <= 0.15)
    // In-row LM score: bigram keys in document order; seen bigrams read
    // the frozen table, unseen take the smoothing fallback with c2 = 0.
    val bigrams = gramArray(col("_toks"), 2)
    val nlls = transform(bigrams, k =>
      coalesce(element_at(nllLit, k),
        -log(lit(1.0) / (coalesce(
          element_at(c1Lit, substring_index(k, " ", 1)), lit(0L)) + lit(lm.v)))))
    gophered
      .withColumn("_nlls", nlls)
      .withColumn("n_bigrams", size(col("_nlls")).cast("long"))
      .withColumn("nll",
        when(col("n_bigrams") > 0,
          round(aggregate(col("_nlls"), lit(0.0), (a, x) => a + x)
            / col("n_bigrams"), 6)))
      .withColumn("lm_keep",
        coalesce(col("nll") <= element_at(thrLit, col("lang")), lit(false)))
      .withColumn("keep", col("gopher_keep") && col("lm_keep"))
      .select(col("doc_id") +: col("lang") +: col("n_words") +:
        col("mean_word_len") +: col("alpha_frac") +: col("top2_frac") +:
        col("top3_frac") +: col("top4_frac") +: col("dup5_frac") +:
        col("gopher_keep") +: col("n_bigrams") +: col("nll") +:
        col("lm_keep") +: col("keep") +: passthrough.map(col): _*)
  }
}
