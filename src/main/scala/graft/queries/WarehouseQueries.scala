package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Warehouse-modeling surface (round 8, fifth wave): slowly-changing
  * dimensions and table profiling — the data-management operators a
  * training-data pipeline needs around its fact tables.
  *
  * - `scd2_build` derives a Type-2 dimension (validity intervals +
  *   version numbers) from a change-event stream: the WRITE path of
  *   temporal modeling. One shuffle on the dimension key; both window
  *   passes reuse the same hash partitioning (exchange reuse), so the
  *   change-point detection and the interval close are sorts, not extra
  *   shuffles.
  * - `scd2_point_lookup` serves the built dimension with a point-in-time
  *   (as-of) join — the READ path — through the engine's existing
  *   [[graft.ops.AsOfJoin]] union-and-fill plan: one co-partitioned
  *   shuffle, no range cross-product. Build→serve composition mirrors
  *   the train→serve edges elsewhere in the catalog (PQ, quality model,
  *   unigram vocab).
  * - `profile_columns` is the profiling pass a pipeline runs before
  *   trusting a new drop: per-column null counts, exact distinct counts
  *   and min/max, emitted as one row per column. Exact multi-column
  *   distinct plans as Spark's expand (×|cols| row replication) — the
  *   oracle-comparable twin. At 100-TB scale the same row shape comes
  *   from one pass of mergeable sketches (`ext/Sketches` HLL per column)
  *   with no expand; the exact spelling here is the verification
  *   baseline, same contract as the labeled quadratics.
  *
  * No reference citation: the reference has no dimension modeling at all
  * (its only state is a per-batch metrics CSV) — north-star surface.
  */
object WarehouseQueries extends QueryPack {

  /** Z-order layout study: files per layout and the bit width each key
    * is normalized to before interleaving.
    */
  val ZFiles = 16L
  val ZBits = 16

  /** Compaction planner: the manifest is pinned at ~this many synthetic
    * "file" stat rows at ANY corpus size (file granularity = ceil(docs /
    * target) is derived IN the query and replayed in the oracle — the
    * adaptive-k pattern), and bin capacity is a multiple of the mean
    * file size.
    */
  val CompactionTargetFiles = 64
  val CompactionCapFactor = 4

  /** Join-cardinality sample rate: 1-in-16 keys (first md5 nibble). */
  val JoinEstRate = 16

  /** Bit-interleave of two ZBits-wide normalized keys, generated ONCE as
    * SQL text over columns `za`/`zb` and evaluated verbatim by BOTH
    * engines — pure integer shifts/masks, so the z-value is exact
    * everywhere.
    */
  private val zInterleave: String =
    (0 until ZBits).map(i =>
      s"(((za >> $i) & 1) << ${2 * i}) | (((zb >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  /** The changing attribute: a user's "tier" carried on signup events
    * (`props.k % 4`). Signups are the dimension's change feed; other
    * event types are facts that later look the dimension up.
    */
  private def tierChanges(s: SparkSession, d: String): DataFrame =
    events(s, d).where(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"),
        tsMillis(col("ts")).as("ts_ms"),
        (expr("try_cast(get_json_object(props, '$.k') as bigint)") % 4)
          .as("tier"))

  /** SCD2 build through [[graft.ops.Scd.type2]]: change points on tier,
    * versions numbered, intervals closed by the next change (null =
    * current). Deterministic ordering (ts_ms, event_id) on both engines.
    */
  private[queries] def scd2Dim(s: SparkSession, d: String): DataFrame =
    graft.ops.Scd.type2(tierChanges(s, d), "user_id", "ts_ms", "event_id", "tier")
      .withColumnRenamed("valid_from", "valid_from_ms")
      .withColumnRenamed("valid_to", "valid_to_ms")

  /** Shared dimension CTE for the DuckDB oracles (the build replayed in
    * SQL; intervals tile each user's timeline so the as-of backward match
    * on valid_from alone is the active version).
    */
  private val duckDim =
    """su AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
      |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS tier
      |  FROM events WHERE event_type = 'signup'),
      |chg AS (SELECT *, lag(tier) OVER
      |    (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev FROM su),
      |cp AS (SELECT user_id, event_id, ts_ms, tier FROM chg
      |       WHERE prev IS NULL OR prev <> tier),
      |dim AS (SELECT user_id,
      |  CAST(row_number() OVER w AS INT) AS version, tier,
      |  ts_ms AS valid_from_ms, lead(ts_ms) OVER w AS valid_to_ms
      |  FROM cp WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
      |""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_build" -> ((s, d) =>
      scd2Dim(s, d).orderBy("user_id", "version")),

    // INCREMENTAL dimension maintenance (ops/ScdStore): the change feed
    // arrives as two time-ordered batches folding into a persisted
    // key-level LSM behind one atomic manifest commit — the CDC shape
    // where re-versioning the whole history per batch is impossible —
    // and the folded view must equal the one-shot build: the oracle IS
    // scd2_build's SQL. The split point is the exact median change time
    // (a plan-time constant, the kCore pattern), so per-key arrival
    // order holds and the quarantine stays empty.
    "scd2_incremental" -> ((s, d) => {
      val path = graft.TempStores.newStore("graft_scd2_q")
      val chg = tierChanges(s, d)
      val cut = chg.agg(expr("percentile(ts_ms, 0.5)")).first().getDouble(0)
      graft.ops.ScdStore.ingestBatch(s, path, chg.where(col("ts_ms") <= cut),
        "user_id", "ts_ms", "event_id", "tier", 0L)
      graft.ops.ScdStore.ingestBatch(s, path, chg.where(col("ts_ms") > cut),
        "user_id", "ts_ms", "event_id", "tier", 1L)
      graft.ops.ScdStore.readDim(s, path).get
        .select(col("key").as("user_id"), col("version"),
          col("attr").as("tier"), col("valid_from").as("valid_from_ms"),
          col("valid_to").as("valid_to_ms"))
        .orderBy("user_id", "version")
    }),

    // Point-in-time serve: every purchase event annotated with the tier
    // version active at purchase time (null where the purchase predates
    // the user's first signup). AsOfJoin.backward = union + one keyed
    // window — no interval cross-join anywhere in the plan.
    "scd2_point_lookup" -> ((s, d) => {
      val purchases = events(s, d).where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), tsMillis(col("ts")).as("ts_ms"))
      graft.ops.AsOfJoin.backward(purchases, scd2Dim(s, d),
          Seq("user_id"), "ts_ms", "valid_from_ms")
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("tier"), col("version"))
        .orderBy("event_id")
    }),

    // Point-in-time feature backfill — the feature-store training-set
    // assembly shape: every purchase event becomes a training row whose
    // features are computed strictly AS OF the event (no leakage): the
    // user's prior event count (row_number over the full event stream),
    // trailing-7-day activity (RANGE frame on event-time millis, self
    // excluded), and the SCD2 tier version active at purchase time
    // (the as-of union-and-fill join). ONE user-keyed exchange serves
    // both windows AND the as-of join's union sort; the dimension side
    // is change-feed-sized.
    "feature_backfill_pit" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        tsMillis(col("ts")).as("ts_ms"), col("event_type"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"), col("event_id"))
      val trail = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
        .rangeBetween(-604800000L, 0L)
      val feats = ev
        .withColumn("n_prior_events",
          (row_number().over(byUser) - 1).cast("long"))
        .withColumn("trail_7d", count(lit(1)).over(trail) - 1)
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("n_prior_events"), col("trail_7d"))
      graft.ops.AsOfJoin.backward(feats, scd2Dim(s, d),
          Seq("user_id"), "ts_ms", "valid_from_ms")
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("n_prior_events"), col("trail_7d"), col("tier"), col("version"))
        .orderBy("event_id")
    }),

    // Z-order layout study — the lakehouse file-clustering argument made
    // measurable: events keyed by (user_id, event time) are assigned to
    // ZFiles "files" under (a) a LINEAR layout (range-bucketed by user
    // alone) and (b) a Z-ORDER layout (range-bucketed by the bit-
    // interleaved z-value), and the query emits each file's row count
    // and per-column key spans. Z-order bounds BOTH spans per file —
    // the reason a z-ordered table prunes row groups on either
    // predicate — where the linear layout leaves the second column's
    // span at full range. Everything is exact integer arithmetic: keys
    // normalize to ZBits via (v - min)·2^ZBits div (range+1), the
    // interleave is generated shift/mask SQL shared VERBATIM by both
    // engines, bucketing is one more integer division (no global sort —
    // range bucketing replaces ntile), min/max ride as a 1-row
    // broadcast. One scan, two keyed aggregates.
    "zorder_file_spans" -> ((s, d) => {
      val e = events(s, d)
        .select(col("user_id").as("u"), tsMillis(col("ts")).as("t"))
      val mm = e.agg(min(col("u")).as("umin"), max(col("u")).as("umax"),
        min(col("t")).as("tmin"), max(col("t")).as("tmax"))
      val scale = 1L << ZBits
      val z = e.crossJoin(broadcast(mm))
        .select(col("u"), col("t"),
          expr(s"(u - umin) * $scale div (umax - umin + 1)").as("za"),
          expr(s"(t - tmin) * $scale div (tmax - tmin + 1)").as("zb"))
        .withColumn("z", expr(zInterleave))
      val files = z.select(col("u"), col("t"),
        expr(s"za * $ZFiles div $scale").as("file_lin"),
        expr(s"z * $ZFiles div ${scale * scale}").as("file_z"))
      def spans(fileCol: String, label: String) = files
        .groupBy(col(fileCol).as("file"))
        .agg(count(lit(1)).as("n_rows"),
          (max(col("u")) - min(col("u"))).as("u_span"),
          (max(col("t")) - min(col("t"))).as("t_span"))
        .select(lit(label).as("layout"), col("file"), col("n_rows"),
          col("u_span"), col("t_span"))
      spans("file_lin", "linear").unionByName(spans("file_z", "zorder"))
        .orderBy("layout", "file")
    }),

    // Table profiling: one aggregate row (count / per-column non-null,
    // exact distinct, min/max) unpivoted to a row per column. Numeric
    // min/max surface as doubles (exact value selection — no arithmetic,
    // so bit-identical cross-engine); the date column via epoch millis;
    // string columns as strings.
    "profile_columns" -> ((s, d) => {
      val o = orders(s, d).withColumn("_od_ms", tsMillis(col("o_orderdate")))
      def num(c: String) = Seq(
        count(col(c)).as(s"c_$c"), countDistinct(col(c)).as(s"d_$c"),
        min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c"))
      def str(c: String) = Seq(
        count(col(c)).as(s"c_$c"), countDistinct(col(c)).as(s"d_$c"),
        min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))
      val aggs = Seq(count(lit(1)).as("n_rows")) ++
        num("o_orderkey") ++ num("o_custkey") ++ num("o_totalprice") ++
        num("_od_ms") ++ str("o_orderstatus") ++ str("o_orderpriority")
      val row = o.agg(aggs.head, aggs.tail: _*)
      def base(name: String, c: String) = Seq(
        lit(name).as("col_name"), col("n_rows").as("n_rows"),
        (col("n_rows") - col(s"c_$c")).as("n_nulls"),
        col(s"d_$c").as("n_distinct"))
      def numRow(name: String, c: String) = struct(base(name, c) ++ Seq(
        col(s"mn_$c").as("min_num"), col(s"mx_$c").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str")): _*)
      def strRow(name: String, c: String) = struct(base(name, c) ++ Seq(
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"mn_$c").as("min_str"), col(s"mx_$c").as("max_str")): _*)
      row.select(explode(array(
          numRow("o_orderkey", "o_orderkey"),
          numRow("o_custkey", "o_custkey"),
          numRow("o_totalprice", "o_totalprice"),
          numRow("o_orderdate_ms", "_od_ms"),
          strRow("o_orderstatus", "o_orderstatus"),
          strRow("o_orderpriority", "o_orderpriority"))).as("r"))
        .select(col("r.*"))
        .orderBy("col_name")
    }),

    // Compaction planning — first-fit-decreasing bin packing of small
    // files into target-size rewrite groups, the metadata-plane
    // algorithm behind every lakehouse OPTIMIZE. The planner's input is
    // MANIFEST-sized (file stats: here 16-doc groups with byte sizes),
    // so the inherently sequential FFD scan runs as ONE `aggregate`
    // fold over the collected, size-sorted file list — the corpus-scale
    // work is only the file-stat aggregation feeding it (the
    // ts_holtwinters contract: sequential algorithms are fine when the
    // sequence is metadata, and the plan never iterates on the driver).
    // First-fit index is a null-filtered indexed transform (no per-bin
    // conditional recursion); the bin capacity is CapFactor × the mean
    // file size, all-integer. Oracle replays the fold as a recursive
    // CTE (list-state rows — the DuckDB list_reduce struct bug does not
    // apply to CTE columns).
    "compaction_plan" -> ((s, d) => compactionPlan(s, d, CompactionTargetFiles)),

    // Incremental view maintenance for JOINS — the property that lets a
    // 100 TB pipeline maintain a join-shaped materialization from
    // deltas instead of recomputing: with both tables split into two
    // arrival batches (content-stable md5 coins on DIFFERENT keys, so
    // every quadrant is non-empty), the maintained view
    // R1 ∪ (ΔL⋈O1 ∪ L1⋈ΔO ∪ ΔL⋈ΔO) must equal the direct join of the
    // unions — and the ORACLE IS the direct join, so the equality is
    // the correctness gate itself (incremental_two_level_agg's
    // contract, one operator up). All four quadrants are keyed joins;
    // nothing scans more than once per quadrant.
    "ivm_join_incremental" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
      val oc = substring(md5(col("o_orderkey").cast("string")), 1, 1)
      val lc = substring(md5(concat_ws(":", col("l_orderkey"),
        col("l_linenumber"))), 1, 1)
      val (o1, o2) = (o.where(oc < "8"), o.where(oc >= "8"))
      val lk = lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val (l1, l2) = (lk.where(lc < "8"), lk.where(lc >= "8"))
      def q(lf: DataFrame, of: DataFrame) =
        lf.join(of, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"), col("rev"))
      q(l1, o1).unionByName(q(l2, o1)).unionByName(q(l1, o2))
        .unionByName(q(l2, o2))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), round(sum(col("rev")), 2).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // Join-cardinality estimation — the query-planning statistic behind
    // every join-order/broadcast decision: |A ⋈_k A| = Σ_k c_k² for the
    // events self-join on user_id (the feature/sessionization join
    // shape), estimated from a CONTENT-STABLE 1-in-16 key sample (first
    // md5 nibble = '0' — reproducible across runs and engines, the
    // DOULION coin) and compared against the exact value in the same
    // pass. Everything is one keyed count + one global aggregate; the
    // estimate never materializes the join. Production keeps only the
    // sampled side; the exact twin here is the verification baseline
    // (the profile_columns contract).
    "join_cardinality_est" -> ((s, d) => {
      val samp = substring(md5(col("user_id").cast("string")), 1, 1) === "0"
      events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(samp, 1L).otherwise(0L)).as("n_keys_sampled"),
          sum(col("c") * col("c")).as("true_card"),
          (sum(when(samp, col("c") * col("c")).otherwise(0L)) *
            JoinEstRate).as("est_card"))
        .select(col("n_keys"), col("n_keys_sampled"), col("true_card"),
          col("est_card"),
          expr("abs(est_card - true_card) * 1000000 div true_card")
            .as("rel_err_micro"))
    }))

  /** [[queries]] `compaction_plan` — next-fit-decreasing boundary
    * packing, fully relational and LINEAR in the manifest (the r10 FFD
    * fold was a single-row O(files²) array rebuild: 366× at the sf1
    * rehearsal; this spelling re-measured flat):
    *
    *  1. file granularity is DERIVED from the corpus row count —
    *     `groupDocs = ceil(docs / targetFiles)` — so the manifest stays
    *     ~targetFiles rows at ANY corpus size (production compactors
    *     bound their planning runs the same way: bigger target files as
    *     the table grows). The count is one plan-time constant to the
    *     driver (the Graph.kCore adaptive-k pattern) and the oracle
    *     replays the identical formula as a scalar subquery;
    *  2. sort size-desc (fid tiebreak), exclusive running sum, and
    *     `bin = prefix div cap + 1`: consecutive files fill a bin until
    *     the capacity boundary passes — one window over the
    *     manifest-bounded frame, no fold, no per-step array rebuild.
    *
    * A bin can exceed `cap` only by part of its LAST (smallest) file —
    * the straddle bound `load − last < cap`, asserted in
    * CompactionSpec. CONSUMER CONTRACT: a bin's total load is therefore
    * `< cap + max_file_size` (worst case just under 2×cap, when a bin's
    * straddling file is itself cap-sized) — anything sizing buffers or
    * task memory off this plan must budget for that bound, not for cap
    * itself. This is the deliberate NFD trade vs the r10 first-fit
    * fold: a strict no-overshoot packer is inherently sequential, while
    * the boundary rule is one prefix-sum window. The global window is
    * safe BY CONSTRUCTION: its input is ≤ targetFiles + 1 rows
    * regardless of corpus size.
    */
  private[graft] def compactionPlan(s: SparkSession, d: String,
      targetFiles: Int): DataFrame = {
    val docs = documents(s, d)
    // Constant plan fact: one long to the driver, folded into the
    // grouping expression and mirrored by the oracle's scalar subquery.
    val nDocs = docs.count()
    val gd = math.max(1L, (nDocs + targetFiles - 1) / targetFiles)
    val files = docs
      .groupBy(expr(s"doc_id div $gd").as("fid"))
      .agg(sum(col("n_chars")).as("sz"))
    val cap = files.agg(
      expr(s"(sum(sz) div count(1)) * $CompactionCapFactor").as("_cap"))
    val byDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("sz").desc, col("fid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .withColumn("_ps", coalesce(sum(col("sz")).over(byDesc), lit(0L)))
      .crossJoin(broadcast(cap))
      .select(col("fid").as("file_id"), col("sz").as("size_chars"),
        expr("_ps div _cap + 1").as("bin"))
      .orderBy("file_id")
  }

  def oracleSql: Map[String, String] = Map(
    "compaction_plan" ->
      s"""WITH gd AS (SELECT greatest(1,
         |    (count(*) + $CompactionTargetFiles - 1) // $CompactionTargetFiles)
         |    AS g FROM documents),
         |f AS (SELECT doc_id // g AS fid, CAST(sum(n_chars) AS BIGINT) AS sz
         |  FROM documents, gd GROUP BY 1),
         |meta AS (SELECT
         |    CAST((sum(sz) // count(*)) * $CompactionCapFactor AS BIGINT) AS cap
         |  FROM f),
         |o AS (SELECT fid, sz,
         |    CAST(coalesce(sum(sz) OVER (ORDER BY sz DESC, fid
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS ps FROM f)
         |SELECT fid AS file_id, sz AS size_chars,
         |  CAST(ps // m.cap + 1 AS BIGINT) AS bin
         |FROM o, meta m ORDER BY file_id""".stripMargin,

    "ivm_join_incremental" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_cardinality_est" ->
      s"""WITH pk AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
         |    CAST(sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) = '0'
         |             THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_sampled,
         |    CAST(sum(c * c) AS BIGINT) AS true_card,
         |    CAST(sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) = '0'
         |             THEN c * c ELSE 0 END) * $JoinEstRate AS BIGINT) AS est_card
         |  FROM pk)
         |SELECT n_keys, n_keys_sampled, true_card, est_card,
         |  abs(est_card - true_card) * 1000000 // true_card AS rel_err_micro
         |FROM ag""".stripMargin,

    "scd2_build" ->
      s"""WITH $duckDim
         |SELECT user_id, version, tier, valid_from_ms, valid_to_ms
         |FROM dim ORDER BY user_id, version""".stripMargin,

    "scd2_incremental" ->
      s"""WITH $duckDim
         |SELECT user_id, version, tier, valid_from_ms, valid_to_ms
         |FROM dim ORDER BY user_id, version""".stripMargin,

    "feature_backfill_pit" ->
      s"""WITH $duckDim,
         |ev AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type
         |  FROM events),
         |f AS (SELECT *,
         |    CAST(row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts_ms, event_id) - 1 AS BIGINT) AS n_prior_events,
         |    CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts_ms
         |      RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW) - 1
         |      AS BIGINT) AS trail_7d
         |  FROM ev),
         |p AS (SELECT event_id, user_id, ts_ms, n_prior_events, trail_7d
         |  FROM f WHERE event_type = 'purchase')
         |SELECT p.event_id, p.user_id, p.ts_ms, p.n_prior_events,
         |  p.trail_7d, dim.tier, dim.version
         |FROM p ASOF LEFT JOIN dim
         |  ON p.user_id = dim.user_id AND p.ts_ms >= dim.valid_from_ms
         |ORDER BY p.event_id""".stripMargin,

    "zorder_file_spans" -> {
      val scale = 1L << ZBits
      s"""WITH e AS (SELECT user_id AS u, epoch_ms(ts) AS t FROM events),
         |mm AS (SELECT min(u) AS umin, max(u) AS umax,
         |  min(t) AS tmin, max(t) AS tmax FROM e),
         |nz AS (SELECT u, t,
         |  (u - umin) * $scale // (umax - umin + 1) AS za,
         |  (t - tmin) * $scale // (tmax - tmin + 1) AS zb
         |  FROM e, mm),
         |zz AS (SELECT u, t, za, $zInterleave AS z FROM nz),
         |f AS (SELECT u, t,
         |  za * $ZFiles // $scale AS file_lin,
         |  z * $ZFiles // ${scale * scale} AS file_z FROM zz),
         |lin AS (SELECT 'linear' AS layout, file_lin AS file,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(max(u) - min(u) AS BIGINT) AS u_span,
         |  CAST(max(t) - min(t) AS BIGINT) AS t_span
         |  FROM f GROUP BY 2),
         |zl AS (SELECT 'zorder', file_z, CAST(count(*) AS BIGINT),
         |  CAST(max(u) - min(u) AS BIGINT), CAST(max(t) - min(t) AS BIGINT)
         |  FROM f GROUP BY 2)
         |SELECT layout, CAST(file AS BIGINT) AS file, n_rows, u_span, t_span
         |FROM (SELECT * FROM lin UNION ALL SELECT * FROM zl)
         |ORDER BY layout, file""".stripMargin
    },

    "scd2_point_lookup" ->
      s"""WITH $duckDim
         |SELECT p.event_id, p.user_id, p.ts_ms, dim.tier, dim.version
         |FROM (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
         |      WHERE event_type = 'purchase') p
         |ASOF LEFT JOIN dim
         |  ON p.user_id = dim.user_id AND p.ts_ms >= dim.valid_from_ms
         |ORDER BY p.event_id""".stripMargin,

    "profile_columns" ->
      """WITH n AS (SELECT count(*) AS n_rows FROM orders)
        |SELECT 'o_orderkey' AS col_name, n.n_rows,
        |  n.n_rows - count(o_orderkey) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS DOUBLE) AS min_num,
        |  CAST(max(o_orderkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM orders, n GROUP BY n.n_rows
        |UNION ALL
        |SELECT 'o_custkey', n.n_rows, n.n_rows - count(o_custkey),
        |  count(DISTINCT o_custkey), CAST(min(o_custkey) AS DOUBLE),
        |  CAST(max(o_custkey) AS DOUBLE), NULL, NULL
        |FROM orders, n GROUP BY n.n_rows
        |UNION ALL
        |SELECT 'o_totalprice', n.n_rows, n.n_rows - count(o_totalprice),
        |  count(DISTINCT o_totalprice), min(o_totalprice), max(o_totalprice),
        |  NULL, NULL
        |FROM orders, n GROUP BY n.n_rows
        |UNION ALL
        |SELECT 'o_orderdate_ms', n.n_rows, n.n_rows - count(o_orderdate),
        |  count(DISTINCT o_orderdate),
        |  CAST(epoch_ms(min(o_orderdate)) AS DOUBLE),
        |  CAST(epoch_ms(max(o_orderdate)) AS DOUBLE), NULL, NULL
        |FROM orders, n GROUP BY n.n_rows
        |UNION ALL
        |SELECT 'o_orderstatus', n.n_rows, n.n_rows - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus), NULL, NULL,
        |  min(o_orderstatus), max(o_orderstatus)
        |FROM orders, n GROUP BY n.n_rows
        |UNION ALL
        |SELECT 'o_orderpriority', n.n_rows, n.n_rows - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority), NULL, NULL,
        |  min(o_orderpriority), max(o_orderpriority)
        |FROM orders, n GROUP BY n.n_rows
        |ORDER BY col_name""".stripMargin)
}
