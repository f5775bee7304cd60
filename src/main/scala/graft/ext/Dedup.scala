package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ext.TextOps._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH
  * (Broder, "On the resemblance and containment of documents", 1997; LSH
  * banding per Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3),
  * SimHash (Charikar, "Similarity estimation techniques from rounding
  * algorithms", STOC 2002), and n-gram Jaccard — each expressed as
  * declarative Spark plans (hash-partitioned groupBys and key-equi joins)
  * that scale by key, never by pairwise row count, except the final
  * candidate-verification join whose input LSH has already pruned.
  *
  * Hashing is the portable md5-derived 32-bit hash (TextOps.hash32) so the
  * signatures have exact DuckDB oracles.
  */
object Dedup {

  /** Exact dedup: one hash-aggregate on the text (at 100 TB: group on
    * md5(text) instead to shuffle 16-byte keys, not documents).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** MinHash parameters: k permutations h_i(x) = (a_i*x + b_i) mod p over
    * the 32-bit token-hash universe. a_i < 2^20 keeps a_i*x < 2^52 —
    * overflow-free in both engines' signed-64 arithmetic.
    */
  val MinhashK = 8
  val MinhashP = 2147483647L // 2^31 - 1, prime
  val ShingleN = 3
  def minhashA(i: Int): Long = 100003L + 7919L * i
  def minhashB(i: Int): Long = 7L + 11117L * i

  /** Shingle-combination constant: a word-n-shingle's hash is the Horner
    * rolling polynomial `acc <- (acc*SA + h_i) mod p` over the PER-TOKEN
    * hashes — one md5 per token instead of one per shingle STRING (~5x
    * fewer md5 evaluations per document, the minhash pipeline's dominant
    * cost). Every position gets a distinct power of SA mod p, so the hash
    * is position-sensitive for ANY n (a flat coefficient scheme would
    * collide leading-token permutations for n>=4). SA < 2^20 and the
    * per-step mod keep every intermediate < 2^52: overflow-free, portable
    * long arithmetic on both engines.
    */
  val ShingleA = 1000003L

  /** Combined shingle hashes from a pre-staged per-token hash array;
    * mirrors shingleSet's <n fallback (documents shorter than n words use
    * their token hashes directly). Routed through the native one-pass
    * [[graft.functions.ShingleHashes]] expression — bit-identical to
    * [[shingleHashesReference]] (proved in VectorExpressionsSpec) without
    * its two interpreted HOFs and per-row index-sequence allocation.
    */
  def shingleHashes(tokHashes: Column, n: Int = ShingleN): Column =
    graft.functions.HashExpressions.shingle_hashes(tokHashes, n, ShingleA, MinhashP)

  /** Declarative reference form of [[shingleHashes]] — the executable spec
    * the native expression is proved against, and the shape the DuckDB
    * oracles mirror.
    */
  def shingleHashesReference(tokHashes: Column, n: Int = ShingleN): Column = {
    val combined = transform(sequence(lit(1), size(tokHashes) - (n - 1)),
      i => (1 until n).foldLeft(element_at(tokHashes, i): Column)((acc, o) =>
        pmod(acc * ShingleA + element_at(tokHashes, i + o), lit(MinhashP))))
    when(size(tokHashes) < n, tokHashes).otherwise(combined)
  }

  /** doc frame -> (id, sig_0..sig_{k-1}) — the per-document sketch over
    * word-ShingleN shingles (unigram minhash is degenerate under a small
    * vocabulary: every band bucket collides and LSH stops pruning).
    *
    * STAGED projections matter here: tokens, shingles, and hashes each
    * become an attribute before reuse. Inlining them instead re-evaluates
    * the regex split inside every `element_at` lambda access (~180 splits
    * per document) and the md5 per signature component — a >100x
    * per-row slowdown measured at sf0.1. Catalyst's CollapseProject keeps
    * the stages because the aliases are referenced more than once.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = MinhashK): DataFrame = {
    val staged = docs
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), hashAll(col("_toks")).as("_th"))
      .select(col(idCol), shingleHashes(col("_th")).as("_hashes"))
    staged.select(col(idCol) +: signaturesFromHashes(col("_hashes"), k): _*)
  }

  /** Signature columns over a pre-staged shingle-hash array. `array_min`
    * of an affine map is identical over the raw hash multiset and its
    * distinct set, so a [[hashSet]] staging (already needed for Jaccard
    * verification) can feed the signatures too — one md5 pass serves both.
    *
    * All k minima come from ONE native traversal
    * ([[graft.functions.MinhashSigs]]); the k projected columns share the
    * array via codegen subexpression elimination. The declarative twin
    * ([[signaturesFromHashesReference]]) evaluates 2k interpreted HOF
    * passes per document.
    */
  def signaturesFromHashes(hashes: Column, k: Int = MinhashK): Seq[Column] = {
    val sigs = graft.functions.HashExpressions.minhash_sigs(
      hashes, k, 100003L, 7919L, 7L, 11117L, MinhashP)
    (0 until k).map(i => element_at(sigs, i + 1).as(s"sig_$i"))
  }

  /** Declarative reference form of [[signaturesFromHashes]] — the
    * executable spec the native expression is proved against, and the
    * shape the DuckDB oracles mirror.
    */
  def signaturesFromHashesReference(hashes: Column, k: Int = MinhashK): Seq[Column] =
    (0 until k).map { i =>
      array_min(transform(hashes,
        h => pmod(lit(minhashA(i)) * h + lit(minhashB(i)), lit(MinhashP)))).as(s"sig_$i")
    }

  /** LSH banding: group the k signature components into `bands` bands and
    * emit (band_index, band_key, id). Near-duplicates agree on at least one
    * full band with high probability; candidate pairs come from a self-join
    * on (band_index, band_key) — a key-equi join, so at scale it's one
    * shuffle on band keys and skewed giant buckets are visible/AQE-split.
    */
  def minhashBands(sigs: DataFrame, idCol: String, bands: Int = 2): DataFrame = {
    val k = sigs.columns.count(_.startsWith("sig_"))
    val rowsPerBand = k / bands
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
      struct(lit(b).as("band_ix"), concat_ws(":", parts: _*).as("band_key"))
    }
    sigs.select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_ix").as("band_ix"), col("band.band_key").as("band_key"))
  }

  /** Candidate pairs (id_a < id_b) sharing at least one LSH band. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = MinhashK, bands: Int = 2): DataFrame = {
    // localCheckpoint: both self-join branches read ONE materialization of
    // the (id, band) frame instead of re-tokenizing + re-hashing the corpus
    // per branch. The frame is sketch-sized (id + band keys), never
    // corpus-sized, so this holds at any scale.
    val b = minhashBands(minhashSignatures(docs, idCol, textCol, k), idCol, bands)
      .localCheckpoint(false)
    val l = b.select(col("band_ix"), col("band_key"), col(idCol).as("id_a"))
    val r = b.select(col("band_ix"), col("band_key"), col(idCol).as("id_b"))
    l.join(r, Seq("band_ix", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard similarity of two token-array columns (distinct-set
    * semantics on both engines: array_intersect/union dedupe).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Token/shingle set as a SORTED array of portable 32-bit hashes — the
    * staging for [[jaccardHashed]]. Distinct-before-hash keeps the md5
    * count at one per distinct token; distinct-after-hash makes the result
    * a true set even under (rare, engine-identical) hash collisions.
    */
  def hashSet(toks: Column): Column =
    sort_array(array_distinct(hashAll(array_distinct(toks))))

  /** Jaccard over two [[hashSet]] columns via the native two-pointer merge
    * (`sorted_overlap`) + inclusion-exclusion — no per-pair hash-set
    * allocation, stays in whole-stage codegen. Evaluated per candidate
    * pair after LSH/blocking, this is the pairwise hot path at scale.
    */
  def jaccardHashed(a: Column, b: Column): Column = {
    val ov = graft.functions.VectorExpressions.sorted_overlap(a, b)
    ov.cast("double") / (size(a) + size(b) - ov)
  }

  /** SimHash-32 over unigram token hashes: for each bit j, sum +-1 over
    * tokens by bit j of hash32(token); bit j of the sketch is the sign.
    * Bit extraction is floor(h / 2^j) % 2 — 2^j as an exact double power
    * (h < 2^32 << 2^53, so the division is exact), because neither engine
    * shifts by a column-valued amount.
    */
  def simhash32(toks: Column): Column = simhash32FromHashes(hashAll(toks))

  /** SimHash over a PRE-STAGED hash-array column: the native one-pass
    * codegen expression (graft.functions.Simhash32). Bit-identical to
    * [[simhash32Reference]] (proved in VectorExpressionsSpec) without its
    * 32 interpreted aggregate passes over the array.
    */
  def simhash32FromHashes(hashes: Column): Column =
    graft.functions.HashExpressions.simhash32(hashes)

  /** Declarative reference form of the sketch — 32 `aggregate` HOFs, one
    * per bit, each a full interpreted pass over the hash array. Kept as
    * the executable spec for the native expression (and as the shape the
    * DuckDB oracle mirrors). Pass an attribute, not an inline expression:
    * the hash array is referenced once per bit (32x).
    */
  def simhash32Reference(hashes: Column): Column =
    (0 until 32).map { j =>
      val bitSum = aggregate(hashes, lit(0L),
        (a, h) => a + shiftright(h, j).bitwiseAND(lit(1L)) * 2L - 1L)
      when(bitSum >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming distance between two simhash sketches (bit-count of xor). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact-recall LSH banding for simhash: split the 32-bit sketch into
    * `bands` contiguous bit-bands. Two sketches within hamming distance d
    * differ in at most d bands, so with bands >= d+1 they MUST agree
    * exactly on at least one band (pigeonhole) — unlike minhash banding,
    * recall at the radius is guaranteed, not probabilistic. Emits one
    * (band_ix, band_key, id, sketch) row per band; candidates come from a
    * key-equi self-join on (band_ix, band_key) — one shuffle on band keys.
    * Scale knob: the per-band key space here is 2^(32/bands) (256 at the
    * default 4); for corpora where 8-bit buckets saturate, widen the
    * sketch (simhash-64 from a 64-bit token hash) and the band width grows
    * to 16 bits with the identical plan shape.
    */
  def simhashBands(sketches: DataFrame, idCol: String, simhashCol: String,
      bands: Int = 4, bits: Int = 32): DataFrame = {
    val width = bits / bands
    val mask = (1L << width) - 1
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band_ix"),
        shiftright(col(simhashCol), b * width).bitwiseAND(lit(mask)).as("band_key"))
    }
    sketches.select(col(idCol), col(simhashCol), explode(array(bandCols: _*)).as("_b"))
      .select(col(idCol), col(simhashCol),
        col("_b.band_ix").as("band_ix"), col("_b.band_key").as("band_key"))
  }

  /** Connected components over an undirected near-duplicate edge list:
    * the step that turns verified pairs into dedup CLUSTERS (keep one doc
    * per component). Iterative min-label propagation with pointer jumping
    * (label ← label(label)), the alternating-star idea of Kiveris et al.,
    * "Connected Components in MapReduce and Beyond" (SoCC 2014): each
    * round is two key-equi joins + a min-aggregate — all hash-shuffles on
    * ids, no global structure — and pointer jumping makes convergence
    * O(log diameter) rounds, so chain-shaped clusters don't serialize.
    * Near-dup graphs are almost all tiny cliques: 2-4 rounds in practice.
    *
    * Returns (node, label) with label = min node id of the component —
    * deterministic. Driver only orchestrates the loop (a `limit(1)` probe
    * per round); per-round state is localCheckpointed to cut lineage.
    */
  /** Incremental exact-dedup ingest — dedup a NEW batch against all
    * corpus HISTORY without rescanning it: the history lives as a
    * key-only parquet store (16-byte md5 per ever-accepted document).
    * Each ingest (1) keeps the first occurrence per key WITHIN the batch
    * (lowest id — arrival order), (2) anti-joins the batch's keys
    * against the store, (3) appends the accepted keys, and returns the
    * accepted documents. First-seen-wins across batches by construction.
    *
    * Scale shape: the anti-join shuffles 16-byte keys, never documents;
    * the store grows by distinct-new keys only and never rewrites
    * (append-only — the segment/ingest pattern the index side uses). At
    * 100 TB history the store is ~1.6 TB of keys; pre-bucketing it (and
    * the batch keys) by key range makes the anti-join shuffle-free on
    * the store side.
    */
  def ingestDedupBatch(spark: org.apache.spark.sql.SparkSession,
      storePath: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val keyed = batch.withColumn("_k", md5(col(textCol)))
    val rn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_k")).orderBy(col(idCol))
    val firstInBatch = keyed
      .withColumn("_rn", row_number().over(rn))
      .where(col("_rn") === 1).drop("_rn")
    val storeExists = {
      val d = new java.io.File(storePath)
      d.isDirectory && d.listFiles() != null &&
        d.listFiles().exists(_.getName.endsWith(".parquet"))
    }
    val fresh =
      if (!storeExists) firstInBatch
      else firstInBatch.join(
        spark.read.parquet(storePath).select(col("k").as("_k")),
        Seq("_k"), "left_anti")
    // two consumers of `fresh` (store append + returned docs), and the
    // append must not observe a half-written store on re-evaluation —
    // pin the accepted keys before the write
    val pinned = fresh.localCheckpoint(false)
    pinned.select(col("_k").as("k"))
      .write.mode("append").parquet(storePath)
    pinned.drop("_k")
  }

  /** Content-defined chunking (CDC) divisor: a token ends a chunk iff its
    * 32-bit hash ≡ 0 (mod CdcMask) — expected chunk length = CdcMask
    * tokens (geometric tail: P(len>k) = (1−1/M)^k, so pathological chunks
    * are probabilistically, not structurally, bounded). Because the cut
    * decision depends ONLY on the token's own content, chunk boundaries
    * re-synchronize immediately after any insertion/deletion — the
    * shift-resistance that makes CDC the storage/corpus dedup standard
    * (LBFS/FastCDC lineage), where fixed-width windows (`dup_span_*`)
    * shift all downstream windows on a one-token edit.
    */
  val CdcMask = 16L

  /** Content-defined chunks of every document: (doc_id, chunk_id, n_toks,
    * chunk_hash). Chunk ids are per-document ordinal (count of boundaries
    * before the token — a boundary token is the LAST token of its chunk);
    * the chunk hash is the same Horner fold the shingle family uses,
    * seeded with the chunk's first token hash (list_reduce semantics, so
    * the DuckDB mirror is exact; single-token chunks hash to the raw
    * token hash).
    *
    * Scale shape: one tokenize+hash projection → posexplode → a per-doc
    * running window (doc-length-bounded sort, the event_transitions
    * class) → (doc, chunk) keyed aggregation whose collect_list is
    * chunk-bounded (mean CdcMask tokens). The HOF fold runs on those
    * chunk-sized arrays only — never on the corpus token stream (§8 HOF
    * rule).
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      mask: Long = CdcMask): DataFrame = {
    val th = docs.select(col(idCol).as("doc_id"),
      hashAll(tokens(col(textCol))).as("_th"))
    val posed = th.select(col("doc_id"), posexplode(col("_th")).as(Seq("p0", "h")))
    val before = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p0"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cut = when(pmod(col("h"), lit(mask)) === 0L, lit(1L)).otherwise(lit(0L))
    val chunked = posed.withColumn("chunk_id",
      coalesce(sum(cut).over(before), lit(0L)))
    chunked.groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_toks"),
        collect_list(struct(col("p0"), col("h"))).as("_ph"))
      .withColumn("_hs",
        transform(array_sort(col("_ph")), x => x.getField("h")))
      .withColumn("chunk_hash",
        aggregate(slice(col("_hs"), lit(2), size(col("_hs")) - 1),
          element_at(col("_hs"), 1),
          (acc, h) => pmod(acc * lit(ShingleA) + h, lit(MinhashP))))
      .select("doc_id", "chunk_id", "n_toks", "chunk_hash")
  }

  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint(false)
    // Seed label = min(node, direct neighbors) — one aggregate, no join:
    // a free first propagation round. Cliques and pairs (the typical
    // near-dup cluster shapes) are already converged here.
    var labels = sym.groupBy(col("src").as("node"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .localCheckpoint(false)
    // Convergence probe BEFORE each round, not after: labels are correct
    // iff both endpoints of every edge carry the same label (every label
    // is a node id ≤ its node from within the component, so a uniform
    // component label can only be the component min — the min node's own
    // label can never drop below itself). Probing first means the common
    // case (clique/pair-shaped near-dup graphs, converged at the seed)
    // costs two key-equi joins and ZERO propagate/jump rounds, where the
    // round-then-check shape always paid for a full round (3 joins + an
    // aggregate + a checkpoint) just to observe no change.
    // r13: the label frame is NODE-sized checkpointed state — broadcast
    // it into the edge-scale probe/propagate joins (the graph family's
    // convention; without the hint the stats-free checkpoint plans as a
    // sort-merge join that shuffles the edge stream every probe/round;
    // billion-node graphs flip the broadcast to a keyed exchange of the
    // node-sized side, the pageRank note).
    def inconsistent(l: DataFrame): Boolean = !sym
      .join(broadcast(l.select(col("node").as("_na"), col("label").as("_la"))),
        col("src") === col("_na"))
      .join(broadcast(l.select(col("node").as("_nb"), col("label").as("_lb"))),
        col("dst") === col("_nb"))
      .where(col("_la") =!= col("_lb")).limit(1).isEmpty
    var it = 0
    while (inconsistent(labels)) {
      if (it >= maxIter)
        throw new IllegalStateException(
          s"connectedComponents did not converge within maxIter=$maxIter rounds; " +
            "labels would be incorrect — raise maxIter (rounds needed is O(log diameter))")
      val nbrMin = sym.join(broadcast(labels), sym("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      val propagated = labels.join(broadcast(nbrMin),
          labels("node") === nbrMin("src"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // pointer jumping: label <- label(label); every label is a node id,
      // so the self-join always resolves.
      labels = propagated.as("x")
        .join(broadcast(propagated.as("y")), col("x.label") === col("y.node"),
          "left")
        .select(col("x.node").as("node"),
          coalesce(col("y.label"), col("x.label")).as("label"))
        .localCheckpoint(false)
      it += 1
    }
    labels
  }

  // ---- incremental near-dup cluster maintenance ----------------------

  /** Shingle-hash sets of a doc frame: (doc_id, toks) with toks sorted
    * distinct — the exact-verification side of the minhash pipeline
    * (same staging the batch `dedup_minhash_pairs` family uses).
    */
  def shingleSetsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_t"))
      .select(col("doc_id"), hashAll(col("_t")).as("_th"))
      .select(col("doc_id"),
        sort_array(array_distinct(shingleHashes(col("_th")))).as("toks"))

  private def clusterManifest(path: String): java.io.File =
    new java.io.File(path, "clusters.manifest")

  /** Replay the label LSM: base generation, then per-batch (label-map,
    * new-docs) deltas in batch order — apply the map (one broadcast
    * join per delta; merges are affected-cluster-sized), then append
    * the batch's docs. Chain depth is bounded by the ingest's
    * compaction policy.
    */
  private def foldLabels(spark: org.apache.spark.sql.SparkSession,
      path: String, entries: Seq[String]): Option[DataFrame] =
    entries.find(_.startsWith("labels-g")).map { baseEntry =>
      val base = spark.read.parquet(s"$path/$baseEntry")
      val deltaIds = entries
        .collect { case e if e.startsWith("lmap-b") || e.startsWith("ndocs-b") =>
          e.substring(e.indexOf("-b") + 2).toLong }
        .distinct.sorted
      deltaIds.foldLeft(base) { (acc, id) =>
        val mapped =
          if (!entries.contains(s"lmap-b$id")) acc
          else acc.join(broadcast(spark.read.parquet(s"$path/lmap-b$id")
              .withColumnRenamed("old_label", "label")),
              Seq("label"), "left")
            .select(col("doc_id"),
              coalesce(col("new_label"), col("label")).as("label"))
        if (!entries.contains(s"ndocs-b$id")) mapped
        else mapped.unionByName(spark.read.parquet(s"$path/ndocs-b$id"))
      }
    }

  /** The live cluster-label view (doc_id, label) of an incremental
    * store, or None before the first committed batch.
    */
  def readClusterLabels(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] =
    graft.ops.Manifest.read(clusterManifest(path)).flatMap(st =>
      foldLabels(spark, path, st.entries))

  /** TIME TRAVEL: the cluster labels exactly as committed by batch
    * `asOfBatch` (newest manifest snapshot at or below it), or None if
    * vacuum pruned that history — see `Manifest.readAt`.
    */
  def readClusterLabelsAt(spark: org.apache.spark.sql.SparkSession,
      path: String, asOfBatch: Long): Option[DataFrame] =
    graft.ops.Manifest.readAt(clusterManifest(path), asOfBatch).flatMap(st =>
      foldLabels(spark, path, st.entries))

  /** Ingest one document batch into a persisted near-dup CLUSTER store —
    * the incremental twin of `minhash pairs → connectedComponents`: the
    * 100 TB crawl reality is that batches arrive forever and the cluster
    * assignment must absorb them without re-pairing the whole corpus.
    *
    * Store layout under `path`, all behind ONE atomic manifest commit
    * point (`ops/Manifest` — the index-segment model): append-only
    * `bands-b<id>` (LSH band keys) and `sets-b<id>` (shingle sets)
    * deltas per batch, and an LSM of labels — one `labels-g<n>` BASE
    * generation plus per-batch `lmap-b<id>` (old_label → new_label
    * merge maps, affected-cluster-sized) and `ndocs-b<id>` (the batch's
    * own labels) deltas. Once the delta chain exceeds `maxDeltas`
    * batches, ingest folds everything into a new base generation in the
    * SAME commit (the index auto-compaction policy). A crash before the
    * commit leaves orphan dirs for vacuum; the watermark makes
    * foreachBatch replays no-ops.
    *
    * Work per batch scales with the BATCH, not the corpus: new band
    * keys hash-join the banded history (keyed shuffle of band keys,
    * never documents), exact-Jaccard verification touches only
    * candidate sets, the label merge runs [[connectedComponents]] on a
    * mini-graph of (new pairs ∪ affected docs' label edges) — old
    * clusters ride in as single label NODES, so merging two million-doc
    * clusters costs one label-map row — and a non-compacting commit
    * WRITES only batch-sized deltas (the corpus-sized base is rewritten
    * only every `maxDeltas` batches, amortizing the rewrite the same
    * way segment compaction amortizes read-amp). Completeness argument:
    * any same-band pair (a, b) of the union corpus is surfaced when its
    * LATER member arrives (the earlier one is in the banded history),
    * so after N batches the labels equal the batch pipeline's clusters
    * over the union — [[ClusterIngestSpec]] proves exactly that,
    * including the cross-batch cluster-merge case and compaction
    * boundaries.
    */
  def ingestClusterBatch(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, textCol: String,
      batchId: Long, jaccardThreshold: Double = 0.5,
      maxDeltas: Int = 4): Unit = {
    val mf = clusterManifest(path)
    val st = graft.ops.Manifest.read(mf)
    if (st.exists(_.maxBatch.exists(batchId <= _))) return // replayed batch
    val entries = st.map(_.entries).getOrElse(Seq.empty)
    if (batch.isEmpty) { // advance the watermark only — no dataless deltas
      graft.ops.Manifest.write(mf, entries,
        Some((st.flatMap(_.maxBatch).toSeq :+ batchId).max))
      return
    }

    // Batch staging: shingle sets + LSH bands, pinned (two consumers
    // each: the delta write and the pair build must see one evaluation).
    val sets = shingleSetsOf(batch, idCol, textCol).localCheckpoint(false)
    val sigs = sets.select(col("doc_id") +: signaturesFromHashes(col("toks")): _*)
    val bands = minhashBands(sigs, "doc_id").localCheckpoint(false)
    val setsDir = s"sets-b$batchId"
    val bandsDir = s"bands-b$batchId"
    sets.write.mode("overwrite").parquet(s"$path/$setsDir")
    bands.write.mode("overwrite").parquet(s"$path/$bandsDir")

    // Candidates: within-batch banding plus new-vs-history band probes.
    val bk = Seq("band_ix", "band_key")
    val within = bands.as("l").join(bands.as("r"),
        col("l.band_ix") === col("r.band_ix") &&
          col("l.band_key") === col("r.band_key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
    val histBandDirs = entries.filter(_.startsWith("bands-"))
    val cand0 =
      if (histBandDirs.isEmpty) within
      else {
        val hist = spark.read.parquet(histBandDirs.map(e => s"$path/$e"): _*)
        within.unionByName(hist.join(bands.withColumnRenamed("doc_id", "_new"), bk)
          .select(least(col("doc_id"), col("_new")).as("id_a"),
            greatest(col("doc_id"), col("_new")).as("id_b"))
          .where(col("id_a") =!= col("id_b")))
      }
    val cand = cand0.distinct()

    // Exact-Jaccard verification over the candidate sets only (history
    // sets are read but immediately semi-pruned by the candidate join).
    val allSets = {
      val histSetDirs = entries.filter(_.startsWith("sets-"))
      if (histSetDirs.isEmpty) sets
      else sets.unionByName(
        spark.read.parquet(histSetDirs.map(e => s"$path/$e"): _*))
    }
    val pairs = cand
      .join(allSets.select(col("doc_id").as("id_a"), col("toks").as("_ta")), Seq("id_a"))
      .join(allSets.select(col("doc_id").as("id_b"), col("toks").as("_tb")), Seq("id_b"))
      .where(jaccardHashed(col("_ta"), col("_tb")) >= jaccardThreshold)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(false)

    // Label merge on the mini-graph: new pairs, plus one (doc -> label)
    // edge per affected OLD doc — its whole cluster rides in as the
    // label node (labels looked up in the folded LSM view).
    val curLabels = foldLabels(spark, path, entries)
    val endpoints = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    val miniEdges = curLabels match {
      case None => pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      case Some(l) =>
        pairs.select(col("id_a").as("a"), col("id_b").as("b"))
          .unionByName(l.join(endpoints, Seq("doc_id"))
            .select(col("doc_id").as("a"), col("label").as("b")))
    }
    // Batch outcome as LSM deltas: the merge map (safe to take straight
    // from cc — a node can only equal ITS OWN cluster's label, doc ids
    // are unique, so non-label node entries match nothing) and the
    // batch's own labels.
    val ccOpt =
      if (miniEdges.isEmpty) None
      else Some(connectedComponents(miniEdges, "a", "b").localCheckpoint(false))
    val lmap = ccOpt.map(_.where(col("node") =!= col("label"))
      .select(col("node").as("old_label"), col("label").as("new_label")))
    val newRows = ccOpt match {
      case None => sets.select(col("doc_id"), col("doc_id").as("label"))
      case Some(cc) => sets.select(col("doc_id"))
        .join(broadcast(cc.withColumnRenamed("node", "doc_id")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("label"))
    }

    val wm = (st.flatMap(_.maxBatch).toSeq :+ batchId).max
    val keep = entries :+ setsDir :+ bandsDir
    val deltaBatches = entries.count(_.startsWith("ndocs-b")) + 1
    if (curLabels.isEmpty || deltaBatches > maxDeltas) {
      // Compacting commit: fold base + all deltas + this batch into a
      // fresh base generation; the delta entries leave the live set.
      val gen = entries.find(_.startsWith("labels-g"))
        .map(_.stripPrefix("labels-g").toLong + 1).getOrElse(0L)
      val folded = curLabels match {
        case None => newRows
        case Some(l) =>
          val mapped = lmap.map(m =>
            l.join(broadcast(m.withColumnRenamed("old_label", "label")),
                Seq("label"), "left")
              .select(col("doc_id"),
                coalesce(col("new_label"), col("label")).as("label")))
            .getOrElse(l)
          mapped.unionByName(newRows)
      }
      folded.write.mode("overwrite").parquet(s"$path/labels-g$gen")
      graft.ops.Manifest.write(mf,
        keep.filterNot(e => e.startsWith("labels-g") ||
          e.startsWith("lmap-b") || e.startsWith("ndocs-b")) :+ s"labels-g$gen",
        Some(wm))
    } else {
      // Delta commit: batch-sized writes only.
      val lmapEntry = lmap.filter(!_.isEmpty).map { m =>
        val e = s"lmap-b$batchId"
        m.write.mode("overwrite").parquet(s"$path/$e")
        e
      }
      val ndocsEntry =
        if (newRows.isEmpty) None
        else {
          val e = s"ndocs-b$batchId"
          newRows.write.mode("overwrite").parquet(s"$path/$e")
          Some(e)
        }
      graft.ops.Manifest.write(mf,
        keep ++ lmapEntry.toSeq ++ ndocsEntry.toSeq, Some(wm))
    }
  }

  /** Garbage-collect directories the cluster manifest no longer
    * references (superseded label generations, crash orphans).
    */
  def vacuumClusterStore(path: String): Unit =
    graft.ops.Manifest.vacuum(clusterManifest(path), new java.io.File(path))
}
