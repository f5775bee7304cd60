package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ext.Similarity

/** Evaluation surface (round 8, fifth wave): the measurement operators a
  * training-data pipeline runs over its OWN outputs — retrieval-quality
  * scoring of the ANN stack and preference-strength ratings from mined
  * pairwise comparisons. Both are expressed as the same oracle-checked
  * catalog queries as everything else: an eval harness you cannot verify
  * is just another unverified program.
  *
  * - `rank_eval_ndcg` grades the IVF ANN ranking against the exact-cosine
  *   ground truth on a deterministic query sample: recall@10 and binary-
  *   relevance NDCG@10 per query, all in integer micro-units (the gain
  *   table is precomputed to integer constants shared verbatim by both
  *   engines, so the comparison is EXACT). The ground-truth pass is
  *   |Q|·N cosines — the eval-time budget every ANN paper pays; |Q| is a
  *   fixed-rate sample of the corpus, each query one broadcast row.
  * - `preference_bt_scores` fits Bradley-Terry strengths over the
  *   preference matches implied by per-(lang, source) quality: each lang
  *   acts as a judge over source pairs (winner = higher mean quality,
  *   compared by exact integer cross-multiplication — no float division),
  *   then [[BtIters]] minorization-maximization rounds (Hunter 2004) in
  *   integer micro-units. Every iteration is one keyed join+agg over the
  *   roster-sized match matrix; the corpus-scale work (quality scan,
  *   cell aggregation) happens exactly once. The oracle replays the full
  *   MM chain as one CTE block per iteration (the PageRank pattern) —
  *   EXACT integer comparison.
  *
  * No reference citation: the reference has no eval operators (its
  * "evaluation" is matplotlib plots of the metrics CSV) — north-star
  * surface alongside the pipeline/retrieval packs.
  */
object EvalQueries extends QueryPack {

  /** Query sample: vec_id % QStep == 0, capped at MaxQ ids → 4 queries at
    * sf0.01 (500 vectors), 16 at sf0.1 (2000). The cap bounds the broadcast
    * query set to a CONSTANT regardless of corpus size — at 100 TB the
    * eval still scans the corpus once per query batch, but |Q| never grows
    * past MaxQ (an uncapped fixed-rate sample would make the broadcast
    * side corpus-proportional).
    */
  val QStep = 125
  val MaxQ = 64
  val NdcgK = 10
  val NumCells = 16
  val NProbe = 4

  /** Binary-relevance DCG gain for rank i (1-based), in micro-units:
    * round(1e6 / log2(i+1)). Computed once here and embedded as literals
    * in BOTH plans, so no runtime transcendental ever crosses engines.
    */
  val GainMicro: Seq[Long] =
    (1 to NdcgK).map(i => Math.round(1e6 / (Math.log(i + 1.0) / Math.log(2.0))))
  val IdcgMicro: Long = GainMicro.sum

  val BtIters = 5

  // ---------------------------------------------------------------- NDCG

  private def rankEval(s: SparkSession, d: String): DataFrame = {
    import Similarity.{asDouble, dot, norm}
    val e = embeddings(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = broadcast(e.where(col("vec_id") % QStep === 0 &&
        col("vec_id") < QStep.toLong * MaxQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm")))
    def cos(vc: Column, nc: Column) =
      round(dot(vc, col("qv")) / (nc * col("qnrm")), 6)

    // ground truth: exact cosine top-k per query (the eval-time full scan)
    val exact = e.crossJoin(q).where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cos(col("v"), col("nrm")).as("cos"))
    val truth = graft.plans.TopK.perKey(exact, Seq("qid"),
        Seq(("cos", true), ("vec_id", false)), NdcgK)
      .select(col("qid"), col("vec_id"), lit(1L).as("hit"))

    // system under test: the IVF serving plan (broadcast-argmax assign,
    // nprobe cell pruning) — identical spelling to sim_ivf_topk
    val assign = Similarity.ivfAssign(embeddings(s, d), "vec_id", "embedding", NumCells)
    val cents = broadcast(e.where(col("vec_id") < NumCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cnrm")))
    val probe = graft.plans.TopK.perKey(
        cents.crossJoin(q).select(col("qid"), col("cell"),
          cos(col("cv"), col("cnrm")).as("qcos")),
        Seq("qid"), Seq(("qcos", true), ("cell", false)), NProbe)
      .select(col("qid"), col("cell"))
    val cand = assign.join(broadcast(probe), Seq("cell"))
      .join(q, Seq("qid"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cos(col("vecd"), col("nrm")).as("cos"))
    val sys = graft.plans.TopK.perKey(cand, Seq("qid"),
      Seq(("cos", true), ("vec_id", false)), NdcgK)

    val ranked = sys.withColumn("rank", row_number().over(
      Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
    // truth is |Q|·K rows (constant-bounded) — broadcast, don't shuffle
    ranked.join(broadcast(truth), Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(count(col("hit")).as("n_hits"),
        coalesce(sum(when(col("hit").isNotNull,
          element_at(lit(GainMicro.toArray), col("rank")))), lit(0L)).as("dcg_w"))
      .select(col("qid"), col("n_hits"), col("dcg_w"),
        expr(s"dcg_w * 1000000 div $IdcgMicro").as("ndcg_micro"),
        expr(s"n_hits * 1000000 div $NdcgK").as("recall_micro"))
      .orderBy("qid")
  }

  // ------------------------------------------------------- Bradley-Terry

  /** Matches: per lang (judge), every source pair with distinct mean
    * quality — winner by exact integer cross-multiplication
    * qsum_a·n_b vs qsum_b·n_a (means never materialized as floats).
    */
  private def btMatches(s: SparkSession, d: String): DataFrame = {
    val qm = ExtensionQueries.qualityScored(s, d)
      .select(col("doc_id"),
        expr("cast(round(quality * 1000000) as bigint)").as("qm"))
    val cell = qm
      .join(documents(s, d).select(col("doc_id"), col("source"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("qm")).as("qsum"), count(lit(1)).as("nd"))
    val a = cell.select(col("lang"), col("source").as("sa"),
      col("qsum").as("qa"), col("nd").as("na"))
    val b = cell.select(col("lang"), col("source").as("sb"),
      col("qsum").as("qb"), col("nd").as("nb"))
    // cell is (lang × source)-sized — constant roster cardinality, so the
    // self-join broadcasts by design (post-agg sides are statless for AQE)
    a.join(broadcast(b), Seq("lang")).where(col("sa") < col("sb"))
      .where(col("qa") * col("nb") =!= col("qb") * col("na"))
      .select(col("lang"), col("sa"), col("sb"),
        when(col("qa") * col("nb") > col("qb") * col("na"), col("sa"))
          .otherwise(col("sb")).as("winner"))
  }

  /** The MM fit lives in [[graft.ext.BradleyTerry]] (unit-tested on
    * synthetic match matrices); this just renames the roster column.
    */
  private def btScores(s: SparkSession, d: String): DataFrame =
    graft.ext.BradleyTerry.fit(btMatches(s, d), "sa", "sb", "winner", BtIters)
      .withColumnRenamed("player", "source")
      .orderBy("source")

  // ---------------------------------------------------- calibration/ECE

  /** Reliability diagram of the TRAINED quality model against its own
    * heuristic labels: predicted probability bucketed into 10 bins, each
    * bin's mean confidence vs empirical positive rate and their gap (the
    * per-bin term of expected calibration error), all in integer
    * micro-units (scores are r6-rounded, so ×1e6 is exact; rates are
    * integer floor-divisions). One text pass (score + label side by
    * side), one 10-row aggregate — corpus-linear, KB-sized shuffle.
    */
  private def calibration(s: SparkSession, d: String): DataFrame = {
    import graft.ext.QualityModel
    val docs = documents(s, d)
    val m = QualityModel.train(docs)
    QualityModel.scoreLabeled(docs, m)
      .select(col("score"), col("y"),
        least(floor(col("score") * 10).cast("long"), lit(9L)).as("bin"))
      .groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        sum(expr("cast(round(score * 1000000, 0) as bigint)")).as("_sc"),
        sum(col("y").cast("long")).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("_sc div n").as("conf_micro"),
        expr("n_pos * 1000000 div n").as("acc_micro"),
        abs(expr("_sc div n") - expr("n_pos * 1000000 div n")).as("gap_micro"))
      .orderBy("bin")
  }

  /** Exact ROC-AUC of the trained quality model against its heuristic
    * labels, via the tie-corrected Mann-Whitney rank-sum — computed from
    * the SCORE HISTOGRAM, not a corpus-wide rank: scores are r6-rounded,
    * so grouping by the micro-unit value yields a ≤|distinct scores|-row
    * table; a tied group's average rank is cum_before + (cnt+1)/2, kept
    * integer by working in DOUBLED ranks. AUC = (2·RankSum₊ −
    * n₊(n₊+1)) / (2·n₊·n₋) as one integer floor-division — EXACT, no
    * rank lottery. The only ordered pass is a window over the tiny
    * histogram; the corpus work is one text scan + one keyed count.
    */
  private def auc(s: SparkSession, d: String): DataFrame = {
    import graft.ext.QualityModel
    val docs = documents(s, d)
    val m = QualityModel.train(docs)
    val g = QualityModel.scoreLabeled(docs, m)
      .select(expr("cast(round(score * 1000000, 0) as bigint)").as("sm"),
        col("y").cast("long").as("y"))
      .groupBy(col("sm"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val byScore = Window.orderBy(col("sm"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum", coalesce(sum(col("cnt")).over(byScore), lit(0L)))
      .agg(sum(expr("pos * (2 * cum + cnt + 1)")).as("rs2"),
        sum(col("pos")).as("n_pos"),
        sum(col("cnt") - col("pos")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        expr("(rs2 - n_pos * (n_pos + 1)) * 1000000 div (2 * n_pos * n_neg)")
          .as("auc_micro"))
  }

  /** Confusion matrix + chance-corrected agreement of the trained quality
    * model against its heuristic labels at the 0.5 threshold: TP/FP/FN/TN
    * counts, precision/recall/F1, and Cohen's kappa — the agreement
    * statistic a labeling pipeline reports when reconciling a cheap model
    * against its rule-based rater. All ratios are integer floor-divisions
    * over micro-units; kappa's numerator (N·agree − Σ marginal products)
    * can be negative, which both engines truncate toward zero
    * identically. The threshold compares the ×1e6-ROUNDED score (the
    * calibration query's proven-portable quantity), never the raw float.
    * One text scan + one 1-row aggregate; bigint-safe to N ≈ 3e6 labeled
    * docs (N²·1e6 < 2^63) — a labeled EVAL set size, not corpus size.
    */
  private def confusion(s: SparkSession, d: String): DataFrame = {
    import graft.ext.QualityModel
    val docs = documents(s, d)
    val m = QualityModel.train(docs)
    QualityModel.scoreLabeled(docs, m)
      .select((expr("cast(round(score * 1000000, 0) as bigint)") >= 500000L)
          .cast("long").as("pred"),
        col("y").cast("long").as("y"))
      .agg(sum(col("pred") * col("y")).as("tp"),
        sum(col("pred") * (lit(1L) - col("y"))).as("fp"),
        sum((lit(1L) - col("pred")) * col("y")).as("fn"),
        sum((lit(1L) - col("pred")) * (lit(1L) - col("y"))).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("tp + fp + fn + tn").as("n"),
        expr("(tp + tn) * 1000000 div (tp + fp + fn + tn)").as("accuracy_micro"),
        expr("tp * 1000000 div nullif(tp + fp, 0)").as("precision_micro"),
        expr("tp * 1000000 div nullif(tp + fn, 0)").as("recall_micro"),
        expr("2 * tp * 1000000 div nullif(2 * tp + fp + fn, 0)").as("f1_micro"),
        expr("""((tp + fp + fn + tn) * (tp + tn)
               |  - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))) * 1000000
               | div nullif((tp + fp + fn + tn) * (tp + fp + fn + tn)
               |  - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)), 0)"""
          .stripMargin).as("kappa_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rank_eval_ndcg" -> ((s, d) => rankEval(s, d)),
    "preference_bt_scores" -> ((s, d) => btScores(s, d)),
    "eval_confusion_kappa" -> ((s, d) => confusion(s, d)),
    "eval_calibration" -> ((s, d) => calibration(s, d)),
    "eval_auc" -> ((s, d) => auc(s, d)),
    "eval_rbo" -> ((s, d) => rbo(s, d)))

  /** Rank-biased overlap depth and persistence (Webber et al. 2010).
    * The per-item contribution of an item whose LATER rank across the
    * two lists is m — Σ_{d=m..D} p^(d-1)/d, the tail of the truncated
    * RBO sum that item participates in — is precomputed to nano-unit
    * integer literals embedded VERBATIM in both plans (the GainMicro
    * pattern), so no runtime transcendental crosses engines and the
    * corpus-side reduction is a LONG sum (order-independent, exact).
    */
  val RboDepth = 50
  val RboP = 0.9
  val RboWeightNano: Seq[Long] = (1 to RboDepth).map { m =>
    Math.round(1e9 * (m to RboDepth)
      .map(dd => Math.pow(RboP, dd - 1) / dd).sum)
  }

  /** RBO@50 between two deterministic rankings of the corpus — by char
    * count vs by token count (ties by doc_id). Measures how much two
    * length-quality proxies agree at the top, the comparison a pipeline
    * runs when swapping ranking signals. Truncated (extrapolation-free)
    * RBO: (1-p) · Σ_d p^(d-1)·|A_d ∩ B_d|/d, reduced per-ITEM via the
    * precomputed tail weights. Scale shape: each top-D list is a
    * TakeOrdered (bounded, no global sort materialization); the rank
    * windows run on the D-row frames; one D-row join.
    */
  private def rbo(s: SparkSession, d: String): DataFrame = {
    import graft.ext.TextOps
    val docs = documents(s, d).select(col("doc_id"), col("n_chars"),
      size(TextOps.tokens(col("text"))).as("_nt"))
    def top(key: Column, rname: String): DataFrame =
      docs.orderBy(key.desc, col("doc_id")).limit(RboDepth)
        .withColumn(rname, row_number().over(
          Window.orderBy(key.desc, col("doc_id"))))
        .select(col("doc_id"), col(rname))
    val wm = array(RboWeightNano.map(lit): _*)
    top(col("n_chars"), "ra").join(top(col("_nt"), "rb"), "doc_id")
      .select(element_at(wm, greatest(col("ra"), col("rb"))).as("wm"))
      .agg(count(lit(1)).as("n_overlap"),
        round(coalesce(sum(col("wm")), lit(0L)).cast("double")
          / lit(1000000000.0) * lit(0.1), 6).as("rbo"))
  }

  // ------------------------------------------------------------- oracles

  private val duckVecBase =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)""".stripMargin

  private def duckCos(a: String, an: String, b: String, bn: String) =
    s"round(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) / ($an * $bn), 6)"

  private val duckNdcg: String = {
    val gains = GainMicro.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, CAST($w AS BIGINT))" }.mkString(", ")
    s"""WITH $duckVecBase,
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM n
       |  WHERE vec_id % $QStep = 0 AND vec_id < ${QStep.toLong * MaxQ}),
       |exact AS (SELECT q.qid, a.vec_id,
       |    ${duckCos("a.v", "a.nrm", "q.qv", "q.qnrm")} AS cos
       |  FROM n a, q WHERE a.vec_id <> q.qid),
       |truth AS (SELECT qid, vec_id FROM exact
       |  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) <= $NdcgK),
       |cent AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < $NumCells),
       |scored AS (SELECT a.vec_id, a.v, a.nrm, c.cell_id,
       |    ${duckCos("a.v", "a.nrm", "c.cv", "c.cnrm")} AS ccos
       |  FROM n a, cent c),
       |assign AS (SELECT vec_id, v, nrm, cell_id AS cell FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell_id) = 1),
       |pq AS (SELECT q.qid, c.cell_id AS cell,
       |    ${duckCos("c.cv", "c.cnrm", "q.qv", "q.qnrm")} AS qcos
       |  FROM cent c, q),
       |probe AS (SELECT qid, cell FROM pq
       |  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cell) <= $NProbe),
       |cand AS (SELECT p.qid, a.vec_id,
       |    ${duckCos("a.v", "a.nrm", "q.qv", "q.qnrm")} AS cos
       |  FROM assign a JOIN probe p ON a.cell = p.cell JOIN q ON q.qid = p.qid
       |  WHERE a.vec_id <> p.qid),
       |sys AS (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
       |  FROM cand QUALIFY rnk <= $NdcgK),
       |w(rnk, wg) AS (VALUES $gains),
       |agg AS (SELECT s.qid, CAST(count(t.vec_id) AS BIGINT) AS n_hits,
       |    CAST(coalesce(sum(CASE WHEN t.vec_id IS NOT NULL THEN w.wg END), 0) AS BIGINT) AS dcg_w
       |  FROM sys s JOIN w ON w.rnk = s.rnk
       |  LEFT JOIN truth t ON t.qid = s.qid AND t.vec_id = s.vec_id
       |  GROUP BY s.qid)
       |SELECT qid, n_hits, dcg_w,
       |  CAST(dcg_w * 1000000 // $IdcgMicro AS BIGINT) AS ndcg_micro,
       |  CAST(n_hits * 1000000 // $NdcgK AS BIGINT) AS recall_micro
       |FROM agg ORDER BY qid""".stripMargin
  }

  private val duckBt: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH ${ExtensionQueries.duckQualityCtes},
      |dq AS MATERIALIZED (SELECT q.doc_id,
      |    CAST(round(q.quality * 1000000) AS BIGINT) AS qm, d.source, d.lang
      |  FROM quality q JOIN documents d USING (doc_id)),
      |cell AS MATERIALIZED (SELECT lang, source, CAST(sum(qm) AS BIGINT) AS qsum,
      |    CAST(count(*) AS BIGINT) AS nd FROM dq GROUP BY 1, 2),
      |mt AS MATERIALIZED (SELECT a.lang, a.source AS sa, b.source AS sb,
      |    CASE WHEN a.qsum * b.nd > b.qsum * a.nd THEN a.source ELSE b.source END AS winner
      |  FROM cell a JOIN cell b ON a.lang = b.lang AND a.source < b.source
      |  WHERE a.qsum * b.nd <> b.qsum * a.nd),
      |roster AS MATERIALIZED (SELECT DISTINCT source FROM
      |  (SELECT sa AS source FROM mt UNION ALL SELECT sb FROM mt)),
      |played AS (SELECT sa AS source, sb AS opp FROM mt
      |           UNION ALL SELECT sb, sa FROM mt),
      |nij AS MATERIALIZED (SELECT source, opp, CAST(count(*) AS BIGINT) AS nm
      |  FROM played GROUP BY 1, 2),
      |wins AS MATERIALIZED (SELECT winner AS source, CAST(count(*) AS BIGINT) AS w
      |  FROM mt GROUP BY 1),
      |r0 AS MATERIALIZED (SELECT source, CAST(1000000 AS BIGINT) AS r FROM roster)""".stripMargin
    for (t <- 1 to BtIters) {
      sb ++= s""",
        |den$t AS MATERIALIZED (SELECT n.source,
        |    CAST(sum(n.nm * 1000000000000 // (si.r + sj.r)) AS BIGINT) AS den
        |  FROM nij n JOIN r${t - 1} si ON si.source = n.source
        |             JOIN r${t - 1} sj ON sj.source = n.opp
        |  GROUP BY 1),
        |raw$t AS MATERIALIZED (SELECT si.source,
        |    greatest(1, CASE WHEN d.den IS NULL OR d.den = 0 THEN si.r
        |      ELSE least(coalesce(w.w, 0) * 1000000000000 // d.den, 10000000000)
        |    END) AS r0v
        |  FROM r${t - 1} si
        |  LEFT JOIN den$t d ON d.source = si.source
        |  LEFT JOIN wins w ON w.source = si.source),
        |an$t AS MATERIALIZED (SELECT arg_min(r0v, source) AS anch FROM raw$t),
        |r$t AS MATERIALIZED (SELECT source,
        |    greatest(1, least(r0v * 1000000 // anch, 1000000000)) AS r
        |  FROM raw$t, an$t)""".stripMargin
    }
    sb ++= s""",
      |totals AS (SELECT source, CAST(sum(nm) AS BIGINT) AS n_matches
      |           FROM nij GROUP BY 1)
      |SELECT s.source, coalesce(w.w, 0) AS wins,
      |  coalesce(t.n_matches, 0) AS n_matches, s.r AS bt_micro
      |FROM r$BtIters s
      |LEFT JOIN wins w ON w.source = s.source
      |LEFT JOIN totals t ON t.source = s.source
      |ORDER BY s.source""".stripMargin
    sb.toString
  }

  private val duckConfusion: String = {
    val qT = graft.ext.QualityModel.TrainIters
    s"""WITH ${CorpusQueries.duckQualityTrainChain(qT)},
       |zs AS (SELECT f.doc_id, f.y,
       |  round(0.5 + 0.5 * (z / (1.0 + abs(z))), 6) AS score
       |  FROM (SELECT f.doc_id, f.y,
       |          w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS z
       |        FROM feats f, w$qT w) f),
       |pl AS (SELECT
       |    CAST(CAST(round(score * 1000000, 0) AS BIGINT) >= 500000 AS BIGINT)
       |      AS pred,
       |    CAST(y AS BIGINT) AS y FROM zs),
       |cm AS (SELECT
       |    CAST(sum(pred * y) AS BIGINT) AS tp,
       |    CAST(sum(pred * (1 - y)) AS BIGINT) AS fp,
       |    CAST(sum((1 - pred) * y) AS BIGINT) AS fn,
       |    CAST(sum((1 - pred) * (1 - y)) AS BIGINT) AS tn
       |  FROM pl)
       |SELECT tp, fp, fn, tn, tp + fp + fn + tn AS n,
       |  (tp + tn) * 1000000 // (tp + fp + fn + tn) AS accuracy_micro,
       |  tp * 1000000 // nullif(tp + fp, 0) AS precision_micro,
       |  tp * 1000000 // nullif(tp + fn, 0) AS recall_micro,
       |  2 * tp * 1000000 // nullif(2 * tp + fp + fn, 0) AS f1_micro,
       |  ((tp + fp + fn + tn) * (tp + tn)
       |    - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))) * 1000000
       |   // nullif((tp + fp + fn + tn) * (tp + fp + fn + tn)
       |    - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)), 0) AS kappa_micro
       |FROM cm""".stripMargin
  }

  private val duckCalibration: String = {
    val qT = graft.ext.QualityModel.TrainIters
    s"""WITH ${CorpusQueries.duckQualityTrainChain(qT)},
       |zs AS (SELECT f.doc_id, f.y,
       |  round(0.5 + 0.5 * (z / (1.0 + abs(z))), 6) AS score
       |  FROM (SELECT f.doc_id, f.y,
       |          w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS z
       |        FROM feats f, w$qT w) f),
       |b AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
       |  CAST(round(score * 1000000, 0) AS BIGINT) AS sm, y FROM zs),
       |agg AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(sm) AS BIGINT) AS sc,
       |  CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS n_pos
       |  FROM b GROUP BY 1)
       |SELECT bin, n, n_pos,
       |  CAST(sc // n AS BIGINT) AS conf_micro,
       |  CAST(n_pos * 1000000 // n AS BIGINT) AS acc_micro,
       |  CAST(abs(sc // n - n_pos * 1000000 // n) AS BIGINT) AS gap_micro
       |FROM agg ORDER BY bin""".stripMargin
  }

  private val duckAuc: String = {
    val qT = graft.ext.QualityModel.TrainIters
    s"""WITH ${CorpusQueries.duckQualityTrainChain(qT)},
       |zs AS (SELECT f.y,
       |  CAST(round(round(0.5 + 0.5 * (z / (1.0 + abs(z))), 6) * 1000000, 0)
       |    AS BIGINT) AS sm
       |  FROM (SELECT f.y,
       |          w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS z
       |        FROM feats f, w$qT w) f),
       |g AS (SELECT sm, CAST(count(*) AS BIGINT) AS cnt,
       |  CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS pos FROM zs GROUP BY 1),
       |c AS (SELECT *, CAST(coalesce(sum(cnt) OVER
       |    (ORDER BY sm ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |  AS BIGINT) AS cum FROM g),
       |agg AS (SELECT CAST(sum(pos * (2 * cum + cnt + 1)) AS BIGINT) AS rs2,
       |  CAST(sum(pos) AS BIGINT) AS n_pos,
       |  CAST(sum(cnt - pos) AS BIGINT) AS n_neg FROM c)
       |SELECT n_pos, n_neg,
       |  CAST((rs2 - n_pos * (n_pos + 1)) * 1000000
       |    // (2 * n_pos * n_neg) AS BIGINT) AS auc_micro
       |FROM agg""".stripMargin
  }

  /** RBO mirror: full-table rank windows filtered to depth D (DuckDB
    * side is oracle-only — boundedness doesn't matter there), the same
    * nano-unit tail-weight literals indexed by the later rank.
    */
  private def duckRbo: String = {
    val wlist = RboWeightNano.mkString("[", ", ", "]")
    s"""WITH docs AS (SELECT doc_id, n_chars,
       |    len(string_split_regex(lower(text), '\\s+')) AS nt
       |  FROM documents),
       |a AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS ra
       |  FROM docs),
       |b AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY nt DESC, doc_id) AS rb
       |  FROM docs),
       |j AS (SELECT ($wlist)[greatest(ra, rb)] AS wm
       |  FROM a JOIN b USING (doc_id)
       |  WHERE ra <= $RboDepth AND rb <= $RboDepth)
       |SELECT CAST(count(*) AS BIGINT) AS n_overlap,
       |  round(CAST(coalesce(sum(wm), 0) AS DOUBLE)
       |    / 1000000000.0 * 0.1, 6) AS rbo
       |FROM j""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "rank_eval_ndcg" -> duckNdcg,
    "preference_bt_scores" -> duckBt,
    "eval_calibration" -> duckCalibration,
    "eval_auc" -> duckAuc,
    "eval_confusion_kappa" -> duckConfusion,
    "eval_rbo" -> duckRbo)
}
