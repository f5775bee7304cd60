package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ext.{Similarity, TextOps}

/** Round-3 training-pipeline surface: context-window chunking, int8
  * embedding quantization, exact multi-quantile stats, top-p vocabulary
  * cuts, IDF rarity scoring, SemDeDup-style embedding-cluster dedup, and
  * the native `session_window` batch aggregation.
  *
  * Every query has an exact DuckDB oracle. Floating-point is confined to
  * operations whose bit patterns are engine-identical (sequential
  * left-to-right folds, single divisions); counters, quantized codes, and
  * rarity scores are integer-exact so no rounding lottery exists.
  */
object PipelineQueries extends QueryPack {

  /** Context-window chunking: 64-token windows, stride 48 (16-token
    * overlap) — the standard "split long documents for a fixed model
    * context" prep step.
    */
  val ChunkSize = 64
  val ChunkStride = 48

  /** int8 symmetric quantization: codes in [-127, 127]. */
  val QuantLevels = 127

  /** Nucleus (top-p) vocabulary cut at p = 0.9, evaluated in exact integer
    * arithmetic as `10 * cum_before < 9 * total`.
    */
  val RarityScale = 1000000L

  /** Random-projection shape: fixture embeddings are 64-d; project to 16. */
  val EmbedDims = 64
  val ProjectDims = 16

  /** SemDeDup blocking: IVF cells + in-cell cosine floor. The fixture
    * embeddings carry no planted near-dups (max pairwise cos ≈ 0.51), so
    * the floor is 0.3 to exercise the verify path on non-empty output.
    * The cell count is DERIVED in-query from the embedding count —
    * `cells = max(min, vecs div pop)`, cells of ~[[SemCellPop]] vectors
    * at any corpus size — and the oracle replays the identical formula
    * as a scalar subquery (the Graph.kCore adaptive-k pattern), so the
    * quadratic in-cell term stays flat as the corpus grows instead of
    * being pinned by a fixed-cells spelling.
    */
  val SemCellsMin = 16
  val SemCellPop = 32
  val SemMinCos = 0.3

  /** EWMA segmentation: per-key history folds in chunks of this many rows
    * (memory per aggregation group is bounded by it); chunk summaries then
    * fold recursively in groups of the same size for [[EwmaLevels]]
    * levels, so no aggregation buffer anywhere holds more than EwmaChunk
    * elements. Small here so the fixture's ~67-events-per-user corpus
    * exercises the multi-chunk path.
    */
  val EwmaChunk = 32

  /** Composition levels above the chunk level: capacity is
    * EwmaChunk^(EwmaLevels+1) ≈ 1.07e9 events per key with 5 levels —
    * beyond that, the O(1)-state streaming twin (stream/Ewma.scala) is the
    * production path. Idle levels are exact no-ops (singleton groups pass
    * the seed summary through with zero FP ops), so oversizing is cheap.
    */
  val EwmaLevels = 5

  /** DSIR feature space: unigrams + bigrams hashed into this many
    * buckets (Xie et al., "Data Selection for Language Models via
    * Importance Resampling", NeurIPS 2023 — hashed n-gram features make
    * the distribution fit bucket-count-sized regardless of vocabulary).
    */
  val DsirBuckets = 1024L

  // Shared DuckDB fragments (mirror TextOps exactly).
  private val duckToks = """string_split_regex(lower(text), '\s+')"""
  private def duckH32(x: String) = s"('0x' || substr(md5($x), 1, 8))::BIGINT"

  /** (doc_id, _toks, _n) staging shared by the chunk query. */
  private def tokenized(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), col("_toks"), size(col("_toks")).as("_n"))

  /** (doc_id, lang, bucket) — one row per hashed n-gram OCCURRENCE
    * (unigrams + bigrams into [[DsirBuckets]] buckets). Re-derived by
    * each consumer: token-stream-sized, so never pinned (§8); the DSIR
    * fit+score is inherently two text passes.
    */
  private def dsirFeatures(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("_toks"))
      // guard: Spark's sequence(1, n) DESCENDS for n < 1 — short docs
      // must yield an empty bigram list, not [1, 0]
      .withColumn("_bi", when(size(col("_toks")) >= 2,
        expr("transform(sequence(1, size(_toks) - 1)," +
          " i -> concat(_toks[i-1], ' ', _toks[i]))"))
        .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("lang"),
        explode(concat(col("_toks"), col("_bi"))).as("_f"))
      .select(col("doc_id"), col("lang"),
        (TextOps.hash32(col("_f")) % DsirBuckets).as("bucket"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DSIR importance weights (Xie et al. 2023): per-doc log importance
    // ratio between a TARGET distribution (here the lang='en' slice) and
    // the raw corpus, over hashed n-gram features with add-one smoothing
    // on the bucket space. Integer micro-exact by the BM25 recipe: the
    // log-ratio is rounded PER BUCKET on the bucket-count-sized table
    // (ln ulps behind the rounding; products of exact integers, one
    // division), so the per-doc sum is order-independent. Scale shape:
    // fit pass = one text scan reduced to a B-row bucket table (partial
    // aggregation, 1-row total attach, all broadcast); score pass = one
    // text scan joined to the broadcast B-row ratio table, ONE shuffle
    // keyed by doc_id with map-side partial sums. At 100 TB the fit pass
    // runs on a sample (the paper's own setup) — the score pass is the
    // corpus-sized work either way.
    "corpus_dsir_weights" -> ((s, d) => {
      // r13 (guide §2.3/§2.4): the raw feature stream used to flow into
      // TWO consumers (the bucket histogram and the per-doc sum), each
      // re-running the token+bigram explode over the corpus. Aggregating
      // to (doc_id, lang, bucket) counts FIRST shrinks the stream by the
      // per-doc feature multiplicity AND makes the two consumers share
      // one identical exchange subtree, which Spark executes once
      // (ReusedExchange) — one explode pass instead of two. Exact:
      // count(*) = Σc and the per-feature lr sum = Σ c·lr.
      val db = dsirFeatures(s, d)
        .groupBy(col("doc_id"), col("lang"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      val bc = db.groupBy(col("bucket")).agg(
        sum(col("c")).as("cs"),
        sum(when(col("lang") === "en", col("c")).otherwise(lit(0L))).as("ct"))
      val tot = bc.agg(sum(col("cs")).as("s_tot"), sum(col("ct")).as("t_tot"))
      val lr = bc.crossJoin(broadcast(tot))
        .select(col("bucket"),
          round(log(((col("ct") + lit(1.0)) * (col("s_tot") + lit(DsirBuckets.toDouble))) /
            ((col("cs") + lit(1.0)) * (col("t_tot") + lit(DsirBuckets.toDouble)))) * 1e6, 0)
            .cast("long").as("lr_micro"))
      db.join(broadcast(lr), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_feats"),
          sum(col("c") * col("lr_micro")).as("dsir_micro"))
        .orderBy("doc_id")
    }),

    // Native session-window batch aggregation — the built-in operator twin
    // of the lag/cumsum sessionize_30m plan (and of the streaming
    // `session_window` aggregation). One shuffle on user_id; Spark merges
    // overlapping [t, t+gap) intervals per key, so an inter-event gap of
    // EXACTLY the gap duration starts a new session (half-open intervals);
    // the oracle's islands form uses `>= gap` to match.
    "session_window_native" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), tsMillis(col("w.start")).as("session_start_ms"),
          tsMillis(col("w.end")).as("session_end_ms"), col("n_events"))
        .orderBy("user_id", "session_start_ms")),

    // Sliding-window token chunking with overlap (LLM context-window prep):
    // 64-token chunks every 48 tokens. Pure per-row projection + explode —
    // no shuffle, embarrassingly parallel over file splits at 100 TB. The
    // chunk count is exact integer arithmetic (positive-operand div only,
    // identical on both engines); each chunk carries a portable content
    // hash so the oracle verifies chunk CONTENT, not just counts.
    "doc_chunks" -> ((s, d) =>
      tokenized(s, d)
        .withColumn("_last",
          when(col("_n") <= ChunkSize, lit(0L))
            .otherwise(floor((col("_n") - ChunkSize + (ChunkStride - 1)) / lit(ChunkStride))))
        .select(col("doc_id"), col("_toks"),
          explode(sequence(lit(0L), col("_last"))).as("chunk_ix"))
        .withColumn("_chunk",
          slice(col("_toks"), col("chunk_ix") * ChunkStride + 1, lit(ChunkSize)))
        .select(col("doc_id"), col("chunk_ix"),
          size(col("_chunk")).as("n_tokens"),
          TextOps.hash32(concat_ws(" ", col("_chunk"))).as("chunk_h32"))
        .orderBy("doc_id", "chunk_ix")),

    // int8 symmetric quantization of embeddings (the at-scale storage /
    // ANN-memory path: 4x smaller than float32). Per-vector max-abs scale;
    // code_i = floor(x_i/scale + 0.5) — explicit half-up rounding whose
    // double arithmetic is bit-identical on both engines (no round()
    // midpoint lottery). Checksums (sum, sum-of-squares of codes) are
    // exact integers: any cross-engine code flip is caught, rounding-free.
    "embed_quantize" -> ((s, d) =>
      embeddings(s, d)
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
        .withColumn("_maxabs", array_max(transform(col("v"), x => abs(x))))
        .withColumn("_scale", col("_maxabs") / QuantLevels)
        .withColumn("_q",
          when(col("_maxabs") === 0, transform(col("v"), _ => lit(0L)))
            .otherwise(transform(col("v"),
              x => floor(x / col("_scale") + 0.5).cast("long"))))
        .select(col("vec_id"),
          round(col("_scale"), 6).as("scale"),
          array_min(col("_q")).as("q_min"),
          array_max(col("_q")).as("q_max"),
          aggregate(col("_q"), lit(0L), (a, x) => a + x).as("q_sum"),
          aggregate(col("_q"), lit(0L), (a, x) => a + x * x).as("q_norm2"))
        .orderBy("vec_id")),

    // Exact multi-quantile surface: interpolated percentiles over integer
    // cents (round(value*100) — half-away rounding matches on both
    // engines). With p ∈ {.25,.5,.75,.95} the (n-1)*p interpolation mixes
    // integers with dyadic fractions, so the double result is exact and
    // engine-identical before the final /100 display division.
    "percentile_surface" -> ((s, d) =>
      events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("_cents"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(percentile(col("_cents"), lit(0.25)) / 100, 6).as("p25"),
          round(percentile(col("_cents"), lit(0.5)) / 100, 6).as("p50"),
          round(percentile(col("_cents"), lit(0.75)) / 100, 6).as("p75"),
          round(percentile(col("_cents"), lit(0.95)) / 100, 6).as("p95"))
        .orderBy("event_type")),

    // Top-p (nucleus) vocabulary cut per language: order tokens by
    // frequency, keep the smallest prefix covering 90% of token mass.
    // The keep predicate is exact integer arithmetic (10*cum_before <
    // 9*total); per-lang vocabularies are small, so the rank window is
    // bounded by vocabulary size, never corpus size.
    "vocab_nucleus" -> ((s, d) => {
      val counts = documents(s, d)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      val wRank = Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("lang")
      counts
        .withColumn("_cum", sum(col("cnt")).over(wRank))
        .withColumn("_total", sum(col("cnt")).over(wAll))
        .withColumn("_kept", (col("_cum") - col("cnt")) * 10 < col("_total") * 9)
        .groupBy("lang")
        .agg(sum(when(col("_kept"), 1L).otherwise(0L)).as("n_vocab"),
          sum(when(col("_kept"), col("cnt")).otherwise(0L)).as("kept_tokens"),
          max(col("_total")).as("total_tokens"))
        .withColumn("coverage",
          round(col("kept_tokens").cast("double") / col("total_tokens"), 6))
        .orderBy("lang")
    }),

    // IDF rarity scoring: per-token document frequency, per-doc rarity =
    // sum / max of the integer-scaled inverse df (RarityScale div df) over
    // DISTINCT tokens. All integer arithmetic — exact at any scale; the
    // df table is vocabulary-sized and the join is a keyed hash join
    // (broadcast-able: vocabularies grow sublinearly in corpus size).
    "text_rarity" -> ((s, d) => {
      val docToks = documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      val dfs = docToks.groupBy("tok").agg(count(lit(1)).as("df"))
      docToks.join(dfs, Seq("tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_distinct"),
          sum(expr(s"$RarityScale div df")).as("rarity_sum"),
          max(expr(s"$RarityScale div df")).as("rarity_max"))
        .orderBy("doc_id")
    }),

    // Johnson-Lindenstrauss random projection 64 -> 16 dims: deterministic
    // pseudo-random hyperplanes derived from the portable hash (same
    // construction as the sign-LSH planes), so the projection — the cheap
    // preprocessing step before clustering/ANN at scale — is reproducible
    // across engines AND across cluster runs. Pure projection, zero
    // shuffle; the plane constants fold at plan time.
    "embed_project" -> ((s, d) => {
      val staged = embeddings(s, d)
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("_v"))
      val outCols = (0 until ProjectDims).map { p =>
        val plane = array((0 until EmbedDims).map { dd =>
          (TextOps.hash32(lit(s"rp:$p:$dd")) / lit(2147483648.0)) - 1.0
        }: _*)
        round(Similarity.dot(col("_v"), plane), 6).as(s"rp_$p")
      }
      staged.select(col("vec_id") +: outCols: _*).orderBy("vec_id")
    }),

    // Training-mixture plan: per (lang, source) token mass, share of the
    // corpus, and the uniform-target resampling weight (target share /
    // actual share — the DoReMi-style static-mixture shape). One grouped
    // aggregate + a broadcast single-row total; integer mass, single
    // divisions.
    "mixture_plan" -> ((s, d) => {
      val g = documents(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text")))).as("n_tokens"))
      val tot = broadcast(g.agg(sum(col("n_tokens")).as("_tot"),
        count(lit(1)).as("_groups")))
      g.crossJoin(tot)
        .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("_tot"), 6).as("tok_share"),
          round(col("_tot").cast("double") / (col("_groups") * col("n_tokens")), 6).as("weight"))
        .orderBy("lang", "source")
    }),

    // Temperature-scaled multinomial mixing (the mT5/XLM-R low-resource
    // upsampling rule): raw source share p_s = tokens_s / N is smoothed
    // to q_s ∝ p_s^α, boosting tails. α is pinned at 0.5 so the power IS
    // `sqrt` — IEEE-754 requires sqrt correctly rounded, so the smoothed
    // share is bit-identical across engines (a generic pow is only
    // faithfully rounded and could flip a micro-unit at the grid edge).
    // Each sqrt is quantized to nano-units BEFORE the normalizer sum, so
    // the sum is integer-exact regardless of partition order; outputs are
    // the smoothed share and the oversample factor q/p. One grouped agg,
    // totals as 1-row broadcasts — mixture_plan's plan with a second
    // constant-size branch.
    "corpus_mix_alpha" -> ((s, d) => {
      val g = documents(s, d)
        .groupBy("source")
        .agg(sum(size(TextOps.tokens(col("text")))).as("n_tokens"))
      val tot = broadcast(g.agg(sum(col("n_tokens")).as("_tot")))
      val smoothed = g.crossJoin(tot)
        .withColumn("_qn",
          expr("cast(round(sqrt(cast(n_tokens as double) / _tot) * 1000000000) as bigint)"))
      val norm = broadcast(smoothed.agg(sum(col("_qn")).as("_z")))
      smoothed.crossJoin(norm)
        .select(col("source"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("_tot"), 6).as("p_raw"),
          round(col("_qn").cast("double") / col("_z"), 6).as("p_alpha"),
          round((col("_qn").cast("double") / col("_z"))
            / (col("n_tokens").cast("double") / col("_tot")), 6)
            .as("oversample"))
        .orderBy("source")
    }),

    // Recursive CTE (Spark 4 SQL surface): transitive closure over a
    // bounded-depth chain graph (edges only inside 10-doc groups, so
    // recursion depth is a CONSTANT 9 at any corpus size — a recursive
    // query that scales is one whose depth doesn't grow with the data).
    // Identical SQL text runs on both engines.
    "recursive_cte_reach" -> ((s, d) => {
      documents(s, d).select(col("doc_id")).createOrReplaceTempView("pq_docs")
      s.sql("""
        WITH RECURSIVE e AS (
          SELECT a.doc_id AS n, b.doc_id AS m
          FROM pq_docs a JOIN pq_docs b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % 10 <> 9),
        reach(n, m) AS (
          SELECT n, m FROM e
          UNION ALL
          SELECT r.n, e2.m FROM reach r JOIN e e2 ON r.m = e2.n)
        SELECT n AS doc_id, count(*) AS n_reach, max(m) AS max_reach
        FROM reach GROUP BY n ORDER BY doc_id""")
    }),

    // Audio-shaped multimodal op: overlapping windowed energy over the
    // payload's samples (stub: bytes stand in for PCM; the oracle mirrors
    // the byte arithmetic exactly since the fixture text is ASCII).
    "multimodal_audio_windows" -> ((s, d) => {
      import graft.ext.Multimodal
      Multimodal.audioWindows(s,
          Multimodal.withBinaryPayload(documents(s, d), "doc_id", "text"))
        .toDF().orderBy("doc_id", "win_ix")
    }),

    // EWMA per key — the ordered-fold-per-key pattern (recursive state
    // that windows can't express), as a RECURSIVELY SEGMENTED fold:
    // y_i = y_{i-1}/2 + v_i/2 is a linear recurrence, so a chunk of m
    // ordered values composes into the affine map y -> A*y + B with
    // A = 0.5^m (exact: m halvings of 1.0) and B = the zero-seeded
    // sequential fold. Chunks of EwmaChunk rows fold independently
    // (bounded memory per group — never the whole key history), and the
    // chunk summaries — affine maps form a monoid under composition —
    // fold the same way: EwmaLevels composition levels, each grouping
    // EwmaChunk summaries, so EVERY aggregation buffer in the plan holds
    // <= EwmaChunk structs and a key of up to EwmaChunk^(EwmaLevels+1)
    // (~1.07e9) events folds without any O(n)-per-key state (the r4
    // "second segmentation level" residual). Levels whose groups are
    // singletons are exact no-ops (the seed passes through untouched), so
    // idle levels cost one tiny shuffle and zero FP ops. The chunked
    // composition REORDERS roundings vs the whole-history sequential fold
    // (B accumulates without y, then combines once), so raw doubles can
    // differ in the last ulps — equality with the sequential fold holds
    // after round(6) on the fixtures (tested), and the oracle mirrors the
    // composition spelling. Keys beyond EwmaChunk^(EwmaLevels+1) events
    // belong to the streaming twin (stream/Ewma.scala, O(1)/key state) —
    // and the ceiling is ENFORCED, not just documented: after the final
    // level an in-capacity key collapses to exactly one summary with
    // g = 0, so any surviving g > 0 row is an over-capacity key and
    // raise_error fires inside the `n` projection (load-bearing column —
    // Catalyst can't prune the guard) instead of silently emitting
    // multiple partial rows per key.
    // The row_number window sorts per key but SortExec spills.
    "ewma_user_value" -> ((s, d) =>
      ewmaFold(events(s, d)
        .select(col("user_id"), tsMillis(col("ts")).as("t"),
          col("event_id").as("e"), col("value").as("v")))),

    // Null-safe equality join (<=>): NULL keys match each other — the
    // join semantics regular equi-joins silently drop. Plans as a hash
    // join on a NullSafeEqual key (still a key shuffle, not a nested
    // loop); the dimension side is a grouped key-count table.
    "null_safe_join" -> ((s, d) => {
      val keyed = events(s, d).select(col("event_id"),
        when(col("event_id") % 10 === 0, lit(null))
          .otherwise(col("event_id") % 100).as("k"))
      val grp = keyed.groupBy("k").agg(count(lit(1)).as("grp_n"))
      keyed.where(col("event_id") < 500)
        .join(grp.withColumnRenamed("k", "gk"), col("k") <=> col("gk"))
        .select(col("event_id"), col("k"), col("grp_n"))
        .orderBy("event_id")
    }),

    // Hard-negative mining (contrastive/IR training prep): for each query
    // vector, the top-3 most-similar vectors with a DIFFERENT label —
    // high-similarity cross-label pairs are the informative negatives.
    // Queries broadcast (anchor sets are small); ranking runs through the
    // custom TopKPerKey operator (bounded per-key heaps over the exchange,
    // no partition sort) — at scale the candidate stream per query is
    // corpus-sized and must never be fully sorted.
    "sim_hard_negatives" -> ((s, d) => {
      val staged = embeddings(s, d)
        .select(col("vec_id"), col("label"),
          Similarity.asDouble(col("embedding")).as("vecd"))
        .withColumn("nrm", Similarity.norm(col("vecd")))
      val q = broadcast(staged.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("vecd").as("_qv"), col("nrm").as("_qn")))
      val scored = staged.crossJoin(q)
        .where(col("label") =!= col("q_label"))
        .select(col("q_id"), col("vec_id").as("neg_id"),
          round(Similarity.dot(col("vecd"), col("_qv")) / (col("nrm") * col("_qn")), 6)
            .as("cos_sim"))
      graft.plans.TopK.perKey(scored, Seq("q_id"),
          Seq(("cos_sim", true), ("neg_id", false)), 3)
        .orderBy(col("q_id"), col("cos_sim").desc, col("neg_id"))
    }),

    // SQL pipe syntax (Spark 4): the |> operator chain — identical
    // semantics to the nested form, planned identically by Catalyst (the
    // syntax is sugar; the oracle is the plain-SQL spelling).
    "pipe_syntax_agg" -> ((s, d) => {
      events(s, d).createOrReplaceTempView("pq_events")
      s.sql("""
        FROM pq_events
        |> WHERE event_type IN ('click', 'view')
        |> AGGREGATE count(*) AS n, round(sum(value), 6) AS sum_value
           GROUP BY event_type
        |> ORDER BY event_type""")
    }),

    // Collation surface (Spark 4): UTF8_LCASE case-insensitive distinct —
    // the engine-level alternative to lower() normalization (which is the
    // oracle's portable spelling; equal on this ASCII corpus).
    "collated_distinct" -> ((s, d) =>
      documents(s, d)
        .select(explode(split(col("text"), "\\s+")).as("w"))
        .agg(countDistinct(expr("collate(w, 'UTF8_LCASE')")).as("n_ci"),
          countDistinct(col("w")).as("n_cs"))),

    // SemDeDup-style semantic dedup (Abbas et al. 2023 shape): cluster
    // embeddings (IVF assignment around deterministic seed centroids —
    // broadcast centroids, zero shuffle), then exact cosine only WITHIN
    // clusters. The pairwise loop is per-cell, so the quadratic term is
    // bounded by cell size, not corpus size — the scale rule is
    // numCells ∝ corpus (cells of ~constant population), keeping per-cell
    // pairwise work flat while the assignment stays a broadcast
    // projection. The rule is applied IN the query: cells derive from
    // the embedding count (one plan-time constant to the driver) with
    // the same formula replayed in the oracle's scalar subquery. And
    // because cells ∝ n makes a FLAT n·cells argmax quadratic, the
    // assignment is the two-level (coarse-then-fine) form —
    // n·2√cells dot products, ~linear again (Similarity
    // .ivfAssignTwoLevel; both levels replayed in the oracle).
    "semdedup_pairs" -> ((s, d) => {
      val nVecs = embeddings(s, d).count()
      semdedupPairs(s, d,
        math.max(SemCellsMin, (nVecs / SemCellPop).toInt))
    }),

    // Two-level IVF cell population profile — the layout-health view an
    // embedding store reads before serving: skewed cells mean probe
    // imbalance (one hot partition answers most queries) and oversized
    // pairwise blocks in the semdedup path. Same derived cell count and
    // two-level assignment as semdedup_pairs (the oracle replays both
    // argmax levels through the shared CTE); one cells-sized keyed agg
    // on top of the zero-shuffle assignment projection.
    "embed_cell_profile" -> ((s, d) => {
      val nVecs = embeddings(s, d).count()
      Similarity.ivfAssignTwoLevel(embeddings(s, d), "vec_id", "embedding",
          math.max(SemCellsMin, (nVecs / SemCellPop).toInt))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("vec_id")).as("min_vec"), max(col("vec_id")).as("max_vec"))
        .orderBy("cell")
    }))

  /** The semdedup plan, parameterized on cell count so the scale probe can
    * apply the documented rule (numCells ∝ corpus) that the fixed-cells
    * oracle spelling cannot.
    *
    * The assignment carries full 64-dim vectors — vector-stream-sized,
    * so it is neither checkpointed nor persisted (SURVEY §8 rule, r5
    * measurement: the columnar cache scans fat array columns slower
    * than the codegen'd recompute it would save, and its entries
    * accumulate across the catalog). Each self-join branch recomputes
    * the broadcast-argmax projection straight off the embeddings scan —
    * zero shuffle, whole-stage codegen. shuffle_hash on the build side:
    * sort-merge would sort 64-dim double arrays on both sides just to
    * equi-join on a small cell key — a per-partition hash build is the
    * scale-correct physical choice (same lesson as ops/Salt.saltedJoin).
    */
  /** The recursively segmented EWMA fold behind `ewma_user_value` (see the
    * catalog comment there for the algebra). Input must carry columns
    * `(user_id, t, e, v)`; output is one `(user_id, n, ewma)` row per key.
    * `chunk`/`levels` are parameters so tests can exercise the capacity
    * guard with a tiny capacity (`chunk^(levels+1)` events per key) —
    * production callers use the [[EwmaChunk]]/[[EwmaLevels]] defaults.
    */
  def ewmaFold(prepared: DataFrame, chunk: Int = EwmaChunk,
      levels: Int = EwmaLevels): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t", "e")
    val foldStep = (a: org.apache.spark.sql.Column,
        v: org.apache.spark.sql.Column) => a * 0.5 + v * 0.5
    // (c ∘ acc): run acc's affine map first, then c's. b_first tracks
    // the seeded-with-first-element path, b_rest the zero-seeded one.
    val compose = (acc: org.apache.spark.sql.Column,
        c: org.apache.spark.sql.Column) => struct(
      c("g").as("g"),
      (c("a") * acc("a")).as("a"),
      (c("a") * acc("b_first") + c("b_rest")).as("b_first"),
      (c("a") * acc("b_rest") + c("b_rest")).as("b_rest"))
    // One composition level: group `chunk` summaries by (key, g div
    // chunk), fold them in g order — seed is the first summary,
    // slice(2..) supplies the rest (empty for singleton groups: no-op).
    def foldLevel(df: DataFrame): DataFrame =
      df.withColumn("_g2", expr(s"g div $chunk"))
        .groupBy("user_id", "_g2")
        .agg(sum(col("m")).as("m"),
          sort_array(collect_list(struct(col("g"), col("a"),
            col("b_first"), col("b_rest")))).as("_cs"))
        .select(col("user_id"), col("_g2").as("g"), col("m"),
          aggregate(slice(col("_cs"), lit(2), size(col("_cs")) - 1),
            element_at(col("_cs"), 1), compose).as("_f"))
        .select(col("user_id"), col("g"), col("m"),
          col("_f")("a").as("a"), col("_f")("b_first").as("b_first"),
          col("_f")("b_rest").as("b_rest"))
    val level0 = prepared
      .withColumn("rn", row_number().over(w))
      .withColumn("g", expr(s"(rn - 1) div $chunk"))
      .groupBy("user_id", "g")
      .agg(transform(sort_array(collect_list(struct(col("rn"), col("v")))),
        x => x("v")).as("_c"))
      .select(col("user_id"), col("g"), size(col("_c")).cast("long").as("m"),
        aggregate(col("_c"), lit(1.0), (a, _) => a * 0.5).as("a"),
        aggregate(col("_c"), lit(null).cast("double"),
          (a, v) => when(a.isNull, v).otherwise(foldStep(a, v))).as("b_first"),
        aggregate(col("_c"), lit(0.0), foldStep).as("b_rest"))
    (1 to levels).foldLeft(level0)((df, _) => foldLevel(df))
      .select(col("user_id"),
        when(col("g") =!= 0, raise_error(concat(
            lit(s"ewma fold: key exceeds the batch-fold capacity of " +
              s"$chunk^${levels + 1} events (use stream/Ewma for " +
              "larger keys): user_id="), col("user_id").cast("string")))
            .cast("int"))
          .otherwise(col("m").cast("int")).as("n"),
        round(col("b_first"), 6).as("ewma"))
      .orderBy("user_id")
  }

  def semdedupPairs(s: SparkSession, d: String, cells: Int): DataFrame = {
    val assign = Similarity.ivfAssignTwoLevel(embeddings(s, d), "vec_id",
      "embedding", cells)
    val l = assign.select(col("cell"), col("vec_id").as("id_a"),
      col("vecd").as("_va"), col("nrm").as("_na"))
    val r = assign.select(col("cell"), col("vec_id").as("id_b"),
      col("vecd").as("_vb"), col("nrm").as("_nb"))
    l.join(r.hint("shuffle_hash"), Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .select(col("cell"), col("id_a"), col("id_b"),
        round(Similarity.dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")), 6)
          .as("cos_sim"))
      .where(col("cos_sim") >= SemMinCos)
      .orderBy("id_a", "id_b")
  }

  def oracleSql: Map[String, String] = {
    // Two-level IVF assignment CTE chain (mirrors Similarity
    // .ivfAssignTwoLevel — the derived-cells scale path: coarse argmax
    // over ceil(sqrt(cells)) seeds, then fine argmax within the chosen
    // coarse group; a coarse seed's fine centroid is pinned to its own
    // group. ExtensionQueries' fixed-16-cell ANN oracles keep the flat
    // single-level fragment — at constant cells the flat argmax is
    // already linear).
    val duckIvfAssign =
      s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |prm AS (SELECT greatest($SemCellsMin, count(*) // $SemCellPop) AS ncells,
        |    CAST(ceil(sqrt(CAST(greatest($SemCellsMin, count(*) // $SemCellPop) AS DOUBLE))) AS BIGINT) AS ncoarse
        |  FROM embeddings),
        |co AS (SELECT vec_id AS co_id, v AS gv, nrm AS gnrm FROM n
        |  WHERE vec_id < (SELECT ncoarse FROM prm)),
        |cent AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cnrm FROM n
        |  WHERE vec_id < (SELECT ncells FROM prm)),
        |f2c AS (
        |  SELECT cell_id, cv, cnrm,
        |    CASE WHEN cell_id < (SELECT ncoarse FROM prm) THEN cell_id ELSE co_id END AS co
        |  FROM (
        |    SELECT f.cell_id, f.cv, f.cnrm, c.co_id,
        |      round(list_sum(list_transform(generate_series(1, len(f.cv)), i -> f.cv[i] * c.gv[i]))
        |            / (f.cnrm * c.gnrm), 6) AS gcos
        |    FROM cent f, co c)
        |  QUALIFY row_number() OVER (PARTITION BY cell_id ORDER BY gcos DESC, co_id) = 1),
        |v2c AS (
        |  SELECT vec_id, v, nrm, co_id AS co FROM (
        |    SELECT a.vec_id, a.v, a.nrm, c.co_id,
        |      round(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * c.gv[i]))
        |            / (a.nrm * c.gnrm), 6) AS gcos
        |    FROM n a, co c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY gcos DESC, co_id) = 1),
        |assign AS (
        |  SELECT vec_id, v, nrm, cell_id AS cell FROM (
        |    SELECT a.vec_id, a.v, a.nrm, f.cell_id,
        |      round(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * f.cv[i]))
        |            / (a.nrm * f.cnrm), 6) AS fcos
        |    FROM v2c a JOIN f2c f ON a.co = f.co)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY fcos DESC, cell_id) = 1)""".stripMargin

    Map(
      "corpus_dsir_weights" ->
        s"""WITH tq AS (SELECT doc_id, lang, $duckToks AS toks FROM documents),
           |fe AS (SELECT doc_id, lang, unnest(list_concat(toks,
           |    list_transform(generate_series(1, len(toks) - 1),
           |      i -> toks[i] || ' ' || toks[i + 1]))) AS f
           |  FROM tq),
           |fb AS MATERIALIZED (SELECT doc_id, lang,
           |    ${duckH32("f")} % $DsirBuckets AS bucket FROM fe),
           |bc AS MATERIALIZED (SELECT bucket, CAST(count(*) AS BIGINT) AS cs,
           |    CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS ct
           |  FROM fb GROUP BY 1),
           |tot AS (SELECT sum(cs) AS s_tot, sum(ct) AS t_tot FROM bc),
           |lr AS MATERIALIZED (SELECT bucket,
           |    CAST(round(ln(((ct + 1.0) * (s_tot + $DsirBuckets))
           |        / ((cs + 1.0) * (t_tot + $DsirBuckets))) * 1000000, 0)
           |      AS BIGINT) AS lr_micro
           |  FROM bc, tot)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           |  CAST(sum(lr_micro) AS BIGINT) AS dsir_micro
           |FROM fb JOIN lr USING (bucket)
           |GROUP BY 1 ORDER BY doc_id""".stripMargin,

      "session_window_native" ->
        """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
          |marked AS (
          |  SELECT user_id, ts_ms,
          |    CASE WHEN lag(ts_ms) OVER w IS NULL
          |           OR ts_ms - lag(ts_ms) OVER w >= 1800000 THEN 1 ELSE 0 END AS is_new
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
          |sess AS (
          |  SELECT user_id, ts_ms,
          |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms
          |                      ROWS UNBOUNDED PRECEDING) AS session_seq
          |  FROM marked)
          |SELECT user_id, min(ts_ms) AS session_start_ms,
          |  max(ts_ms) + 1800000 AS session_end_ms, count(*) AS n_events
          |FROM sess GROUP BY user_id, session_seq
          |ORDER BY user_id, session_start_ms""".stripMargin,

      "doc_chunks" ->
        s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
           |n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
           |c AS (SELECT doc_id, toks, n,
           |        unnest(generate_series(0, CASE WHEN n <= $ChunkSize THEN 0
           |          ELSE (n - $ChunkSize + ${ChunkStride - 1}) // $ChunkStride END)) AS chunk_ix
           |      FROM n)
           |SELECT doc_id, chunk_ix,
           |  len(list_slice(toks, chunk_ix * $ChunkStride + 1,
           |                 least(chunk_ix * $ChunkStride + $ChunkSize, n))) AS n_tokens,
           |  ${duckH32(s"array_to_string(list_slice(toks, chunk_ix * $ChunkStride + 1, least(chunk_ix * $ChunkStride + $ChunkSize, n)), ' ')")} AS chunk_h32
           |FROM c ORDER BY doc_id, chunk_ix""".stripMargin,

      "embed_quantize" ->
        s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |           FROM embeddings),
           |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
           |q AS (SELECT vec_id, maxabs / $QuantLevels AS scale,
           |        CASE WHEN maxabs = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
           |             ELSE list_transform(v, x -> CAST(floor(x / (maxabs / $QuantLevels) + 0.5) AS BIGINT))
           |        END AS codes
           |      FROM m)
           |SELECT vec_id, round(scale, 6) AS scale,
           |  list_min(codes) AS q_min, list_max(codes) AS q_max,
           |  CAST(list_sum(codes) AS BIGINT) AS q_sum,
           |  CAST(list_sum(list_transform(codes, x -> x * x)) AS BIGINT) AS q_norm2
           |FROM q ORDER BY vec_id""".stripMargin,

      "percentile_surface" ->
        """WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events)
          |SELECT event_type, count(*) AS n,
          |  round(quantile_cont(cents, 0.25) / 100, 6) AS p25,
          |  round(quantile_cont(cents, 0.5) / 100, 6) AS p50,
          |  round(quantile_cont(cents, 0.75) / 100, 6) AS p75,
          |  round(quantile_cont(cents, 0.95) / 100, 6) AS p95
          |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,

      "vocab_nucleus" ->
        s"""WITH tok AS (SELECT lang, unnest($duckToks) AS tok FROM documents),
           |cnt AS (SELECT lang, tok, count(*) AS cnt FROM tok GROUP BY lang, tok),
           |ranked AS (
           |  SELECT lang, tok, cnt,
           |    sum(cnt) OVER (PARTITION BY lang ORDER BY cnt DESC, tok
           |                   ROWS UNBOUNDED PRECEDING) AS cum,
           |    sum(cnt) OVER (PARTITION BY lang) AS total
           |  FROM cnt)
           |SELECT lang,
           |  CAST(sum(CASE WHEN (cum - cnt) * 10 < total * 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_vocab,
           |  CAST(sum(CASE WHEN (cum - cnt) * 10 < total * 9 THEN cnt ELSE 0 END) AS BIGINT) AS kept_tokens,
           |  CAST(max(total) AS BIGINT) AS total_tokens,
           |  round(CAST(sum(CASE WHEN (cum - cnt) * 10 < total * 9 THEN cnt ELSE 0 END) AS DOUBLE)
           |        / max(total), 6) AS coverage
           |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin,

      "text_rarity" ->
        s"""WITH dt AS (SELECT doc_id, unnest(list_distinct($duckToks)) AS tok FROM documents),
           |dfs AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok)
           |SELECT doc_id, count(*) AS n_distinct,
           |  CAST(sum($RarityScale // df) AS BIGINT) AS rarity_sum,
           |  CAST(max($RarityScale // df) AS BIGINT) AS rarity_max
           |FROM dt JOIN dfs USING (tok)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "embed_project" -> {
        val projCols = (0 until ProjectDims).map { p =>
          s"""round(list_sum(list_transform(generate_series(1, $EmbedDims),
             |    i -> v[i] * ((('0x' || substr(md5('rp:$p:' || (i-1)::VARCHAR), 1, 8))::BIGINT
             |                  / 2147483648.0) - 1.0))), 6) AS rp_$p""".stripMargin
        }.mkString(",\n  ")
        s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |           FROM embeddings)
           |SELECT vec_id,
           |  $projCols
           |FROM e ORDER BY vec_id""".stripMargin
      },

      "corpus_mix_alpha" ->
        """WITH g AS (
          |  SELECT source,
          |    sum(len(string_split_regex(lower(text), '\s+'))) AS n_tokens
          |  FROM documents GROUP BY source),
          |t AS (SELECT sum(n_tokens) AS tot FROM g),
          |sm AS (SELECT source, n_tokens,
          |    CAST(round(sqrt(CAST(n_tokens AS DOUBLE) / tot) * 1000000000)
          |      AS BIGINT) AS qn, tot
          |  FROM g, t),
          |z AS (SELECT sum(qn) AS z FROM sm)
          |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
          |  round(CAST(n_tokens AS DOUBLE) / tot, 6) AS p_raw,
          |  round(CAST(qn AS DOUBLE) / z, 6) AS p_alpha,
          |  round((CAST(qn AS DOUBLE) / z)
          |    / (CAST(n_tokens AS DOUBLE) / tot), 6) AS oversample
          |FROM sm, z ORDER BY source""".stripMargin,

      "mixture_plan" ->
        """WITH g AS (
          |  SELECT lang, source, count(*) AS n_docs,
          |    sum(len(string_split_regex(lower(text), '\s+'))) AS n_tokens
          |  FROM documents GROUP BY lang, source),
          |t AS (SELECT sum(n_tokens) AS tot, count(*) AS groups FROM g)
          |SELECT lang, source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
          |  round(CAST(n_tokens AS DOUBLE) / tot, 6) AS tok_share,
          |  round(CAST(tot AS DOUBLE) / (groups * n_tokens), 6) AS weight
          |FROM g, t ORDER BY lang, source""".stripMargin,

      "multimodal_audio_windows" ->
        """WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents),
          |w AS (SELECT doc_id, text, n,
          |        unnest(generate_series(0, CASE WHEN n <= 32 THEN 0
          |          ELSE (n - 32 + 15) // 16 END)) AS win_ix
          |      FROM b)
          |SELECT doc_id, CAST(win_ix AS INT) AS win_ix,
          |  CAST(least(win_ix * 16 + 32, n) - win_ix * 16 AS INT) AS n_samples,
          |  CAST(list_sum(list_transform(
          |    generate_series(win_ix * 16 + 1, least(win_ix * 16 + 32, n)),
          |    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)
          |         * ascii(substr(text, i, 1)))) AS BIGINT) AS energy
          |FROM w ORDER BY doc_id, win_ix""".stripMargin,

      // Mirrors the segmented fold: per-chunk affine summaries (A = m
      // halvings of 1.0, B = zero- or first-element-seeded sequential
      // fold), then a recursive CTE replays y = A*y + B chunk by chunk.
      // The engine's recursive composition evaluates its b_first path with
      // the SAME op sequence (bf' = a*bf + b_rest) whenever at most one
      // composition level is active — true for every fixture SF (<= 1024
      // events/key) — so the match is bit-exact here; with deeper
      // recursion it holds after round(6) (composition reorders roundings
      // in the last ulps only).
      "ewma_user_value" ->
        s"""WITH RECURSIVE seq AS (
          |  SELECT user_id, value AS v,
          |    row_number() OVER (PARTITION BY user_id
          |                       ORDER BY epoch_ms(ts), event_id) AS rn
          |  FROM events),
          |chunks AS (
          |  SELECT user_id, (rn - 1) // $EwmaChunk AS g, count(*) AS m,
          |    list_reduce(list_prepend(1.0, list(v ORDER BY rn)),
          |                (a, v) -> a * 0.5) AS a,
          |    list_reduce(list(v ORDER BY rn),
          |                (a, v) -> a * 0.5 + v * 0.5) AS b_first,
          |    list_reduce(list_prepend(0.0, list(v ORDER BY rn)),
          |                (a, v) -> a * 0.5 + v * 0.5) AS b_rest
          |  FROM seq GROUP BY user_id, g),
          |f(user_id, g, y) AS (
          |  SELECT user_id, g, b_first FROM chunks WHERE g = 0
          |  UNION ALL
          |  SELECT c.user_id, c.g, c.a * f.y + c.b_rest
          |  FROM f JOIN chunks c ON c.user_id = f.user_id AND c.g = f.g + 1),
          |tot AS (
          |  SELECT user_id, CAST(sum(m) AS INT) AS n, max(g) AS gmax
          |  FROM chunks GROUP BY user_id)
          |SELECT t.user_id, t.n, round(f.y, 6) AS ewma
          |FROM tot t JOIN f ON f.user_id = t.user_id AND f.g = t.gmax
          |ORDER BY t.user_id""".stripMargin,

      "null_safe_join" ->
        """WITH keyed AS (
          |  SELECT event_id,
          |    CASE WHEN event_id % 10 = 0 THEN NULL ELSE event_id % 100 END AS k
          |  FROM events),
          |grp AS (SELECT k, count(*) AS grp_n FROM keyed GROUP BY k)
          |SELECT a.event_id, a.k, g.grp_n
          |FROM keyed a JOIN grp g ON a.k IS NOT DISTINCT FROM g.k
          |WHERE a.event_id < 500
          |ORDER BY a.event_id""".stripMargin,

      "sim_hard_negatives" ->
        """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          |           FROM embeddings),
          |n AS (SELECT vec_id, label, v,
          |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
          |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
          |      FROM n WHERE vec_id < 5),
          |scored AS (
          |  SELECT q.q_id, a.vec_id AS neg_id,
          |    round(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * q.qv[i]))
          |          / (a.nrm * q.qn), 6) AS cos_sim
          |  FROM n a, q WHERE a.label <> q.q_label)
          |SELECT q_id, neg_id, cos_sim FROM (
          |  SELECT q_id, neg_id, cos_sim,
          |    row_number() OVER (PARTITION BY q_id
          |      ORDER BY cos_sim DESC, neg_id) AS rn
          |  FROM scored)
          |WHERE rn <= 3 ORDER BY q_id, cos_sim DESC, neg_id""".stripMargin,

      "pipe_syntax_agg" ->
        """SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value
          |FROM events WHERE event_type IN ('click', 'view')
          |GROUP BY event_type ORDER BY event_type""".stripMargin,

      "collated_distinct" ->
        """WITH w AS (SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents)
          |SELECT count(DISTINCT lower(w)) AS n_ci, count(DISTINCT w) AS n_cs
          |FROM w""".stripMargin,

      "recursive_cte_reach" ->
        """WITH RECURSIVE e AS (
          |  SELECT a.doc_id AS n, b.doc_id AS m
          |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          |  WHERE a.doc_id % 10 <> 9),
          |reach(n, m) AS (
          |  SELECT n, m FROM e
          |  UNION ALL
          |  SELECT r.n, e2.m FROM reach r JOIN e e2 ON r.m = e2.n)
          |SELECT n AS doc_id, count(*) AS n_reach, max(m) AS max_reach
          |FROM reach GROUP BY n ORDER BY doc_id""".stripMargin,

      "semdedup_pairs" ->
        s"""WITH $duckIvfAssign
           |SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
           |  round(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
           |        / (a.nrm * b.nrm), 6) AS cos_sim
           |FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
           |WHERE cos_sim >= $SemMinCos
           |ORDER BY id_a, id_b""".stripMargin,

      "embed_cell_profile" ->
        s"""WITH $duckIvfAssign
           |SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
           |  min(vec_id) AS min_vec, max(vec_id) AS max_vec
           |FROM assign GROUP BY cell ORDER BY cell""".stripMargin)
  }
}
