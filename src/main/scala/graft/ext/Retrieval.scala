package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Layout

/** Full-text ranked retrieval: BM25 scoring and a materialized inverted
  * index — the text-side analog of the IVF-PQ vector index (the two
  * together are the retrieval layer a training-data platform serves
  * "find documents like/about X" from).
  *
  * Scale shapes:
  *  - Scoring is posting-list work: ONE tokenize+explode pass with the
  *    query-term filter applied BEFORE the (doc, term) aggregation, so
  *    the shuffle carries only rows matching the query vocabulary —
  *    never the corpus token stream. Per-term df and per-doc length are
  *    keyed aggregates; corpus stats are a 1-row broadcast.
  *  - The materialized index partitions posting rows by a stable hash
  *    bucket of the term; a query touches only `len(query)` buckets
  *    (parquet PartitionFilters — unmatched bucket directories are never
  *    opened). Posting rows are DENORMALIZED (tf, df, dlen in one row, the
  *    Lucene doc-values pattern): serving is scan → projection →
  *    per-doc sum → TakeOrdered, ZERO joins at query time.
  *  - Exactness: per-(doc, term) BM25 contributions round to integer
  *    micro-units before the per-doc sum, so the reduction is
  *    order-independent (partition-count-invariant and identical in
  *    DuckDB); ln() ulps sit behind the same rounding.
  *
  * BM25 constants are the standard Robertson/Lucene defaults; idf is the
  * non-negative Lucene variant ln(1 + (N - df + 0.5)/(df + 0.5)).
  */
object Retrieval {
  val K1 = 1.2
  val B = 0.75

  /** Number of term-hash partitions for the materialized index. Buckets,
    * not raw terms, bound the partition count (a raw-term layout would
    * create vocabulary-many directories — millions of tiny files at
    * corpus scale); a query still prunes to exactly its own terms'
    * buckets. 64 keeps directories ≈ vocabulary/64 terms wide.
    */
  val IndexBuckets = 64

  /** (doc_id, term, tf) posting rows, filtered to `terms` BEFORE the
    * aggregation when a query vocabulary is given (the filter runs
    * map-side on the exploded stream, so the shuffle sees only matches).
    */
  def postings(docs: DataFrame, terms: Option[Seq[String]]): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("term"))
    val hit = terms.fold(tok)(ts => tok.where(col("term").isin(ts: _*)))
    hit.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
  }

  /** Per-document token length — the BM25 length norm. */
  def docLengths(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("dlen"))

  /** One broadcastable row: (n_docs, avgdl). avgdl is one division of two
    * exact integers — identical in any engine.
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docLengths(docs).agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dlen")).cast("double") / count(lit(1))).as("avgdl"))

  /** Per-(doc, term) BM25 contribution in integer micro-units, given
    * `tf`, `df`, `dlen` columns and broadcast `n_docs`/`avgdl`.
    * Micro-unit rounding here (not after the per-doc sum) makes the sum
    * order-independent.
    */
  private def contribMicros(): org.apache.spark.sql.Column = {
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfD = col("tf").cast("double")
    val norm = lit(K1) * (lit(1.0 - B) + lit(B) * col("dlen") / col("avgdl"))
    val c = idf * tfD * lit(K1 + 1.0) / (tfD + norm)
    round(c * lit(1e6), 0).cast("long")
  }

  /** BM25 scores of every document matching ≥1 query term:
    * (doc_id, n_matched, score) with score = Σ_t idf·tf-saturation,
    * micro-unit exact. df is a groupBy aggregate broadcast back onto
    * the postings — NOT a `Window.partitionBy(term)` count: a window
    * materializes each term's whole posting list on ONE task, so a
    * stop-word query term would concentrate corpus-sized rows there,
    * while the aggregate partial-combines map-side and its result is a
    * |query|-row broadcast.
    */
  def bm25Scores(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val p = postings(docs, Some(terms))
    val dfs = p.groupBy("term").agg(count(lit(1)).as("df"))
    bm25FromPostings(
      p.join(broadcast(dfs), Seq("term"))
        .join(docLengths(docs), Seq("doc_id"))
        .crossJoin(broadcast(corpusStats(docs))))
  }

  /** Final per-doc reduction over denormalized posting rows carrying
    * (doc_id, tf, df, dlen, n_docs, avgdl).
    */
  def bm25FromPostings(p: DataFrame): DataFrame =
    p.select(col("doc_id"), contribMicros().as("_c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"),
        (sum(col("_c")).cast("double") / lit(1e6)).as("score"))

  /** Global top-k by score: TakeOrderedAndProject (per-partition heaps),
    * never a global sort. Ties break on doc_id for determinism.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame =
    bm25Scores(docs, terms)
      .orderBy(col("score").desc, col("doc_id")).limit(k)

  /** Stable bucket of a term — the index partition key. Driver-side twin
    * of the `md5_hash32` expression (bit-identical by construction).
    */
  def termBucket(term: String, buckets: Int): Long =
    graft.functions.Md5Hash32Util.hash(UTF8String.fromString(term)) % buckets

  /** Materialize the inverted index: posting rows denormalized with df,
    * dlen and partitioned by term-hash bucket; corpus stats in a 1-row
    * `meta` side table. Within a bucket, rows sort by (term, doc_id) so
    * parquet page stats prune intra-bucket term ranges too.
    */
  def writeInvertedIndex(docs: DataFrame, path: String,
      buckets: Int = IndexBuckets): Unit = {
    val p = postings(docs, None)
    // df via groupBy + keyed join-back, not a per-term window: the
    // window form puts each term's whole posting list on one task — a
    // corpus-scale stop word becomes a single-task straggler. The
    // aggregate partial-combines map-side; the vocabulary-sized df
    // table joins back on term (AQE skew-splittable for hot terms).
    val dfs = p.groupBy("term").agg(count(lit(1)).as("df"))
    val rows = p
      .join(dfs, Seq("term"))
      .join(docLengths(docs), Seq("doc_id"))
      .withColumn("bucket",
        pmod(graft.ext.TextOps.hash32(col("term")), lit(buckets.toLong)))
      .select("bucket", "term", "doc_id", "tf", "df", "dlen")
    Layout.writePartitioned(rows, s"$path/postings", Seq("bucket"),
      sortCols = Seq("term", "doc_id"))
    corpusStats(docs).withColumn("buckets", lit(buckets))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Serve a BM25 top-k query from the materialized index: the postings
    * scan carries `bucket IN (buckets-of-query-terms)` — a partition
    * filter, so unmatched bucket directories are never opened — plus the
    * term filter for parquet row-group pruning inside matched buckets.
    * Scoring is a pure projection + per-doc sum + TakeOrdered: the df,
    * dlen, and corpus stats were frozen into the index at build time.
    */
  def bm25TopKFromIndex(spark: SparkSession, path: String,
      terms: Seq[String], k: Int): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val nDocs = meta.getAs[Long]("n_docs")
    val avgdl = meta.getAs[Double]("avgdl")
    val buckets = meta.getAs[Int]("buckets")
    val bs = terms.map(termBucket(_, buckets)).distinct
    bm25FromPostings(
      spark.read.parquet(s"$path/postings")
        .where(col("bucket").isin(bs: _*) && col("term").isin(terms: _*))
        .withColumn("n_docs", lit(nDocs))
        .withColumn("avgdl", lit(avgdl)))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Conjunctive (AND) boolean retrieval: documents containing EVERY query
    * term — posting-list intersection as one keyed aggregate (match-count
    * == |query|), never a |query|-way self-join. Emits total matched-term
    * occurrences for inspection.
    */
  def conjunctive(docs: DataFrame, terms: Seq[String]): DataFrame =
    postings(docs, Some(terms))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("total_tf"))
      .where(col("n_terms") === terms.length)
      .select("doc_id", "total_tf")

  // ---------------------------------------------------------------------
  // Segmented index — incremental maintenance (the Lucene segment model).
  //
  // The denormalized single-segment index above freezes df/dlen/stats
  // into each posting row: fastest possible serving, but an append would
  // invalidate every stored df. Segments solve it the way real search
  // engines do: each ingest batch becomes an IMMUTABLE segment holding
  //   postings/ (bucket=…): (term, doc_id, tf, dlen)   — no df
  //   df/       (bucket=…): (term, df)                  — per-segment df
  //   meta/     : (n_docs, sum_dlen, buckets)           — 1 row
  // and serving recombines: N and avgdl from summed metas (exact integer
  // sums), df(t) = Σ segments df_s(t) read from the PROBED buckets only.
  // Because every statistic recombines exactly, append+serve is
  // BIT-EQUAL to rebuild+serve on the union corpus (spec-proved) — no
  // staleness approximation at all, unlike frozen-stat designs.
  // ---------------------------------------------------------------------

  /** Write one immutable index segment for `docs` under
    * `path/segments/<name>`.
    */
  def writeIndexSegment(docs: DataFrame, path: String, name: String,
      buckets: Int = IndexBuckets): Unit = {
    val seg = s"$path/segments/$name"
    // POSITIONAL postings: token positions ride per (term, doc) row so
    // the same segment serves phrase queries (positions intersect) —
    // scoring reads never pay for them (parquet column pruning drops
    // the positions column from BM25 scans). tf = positions length.
    val posed = docs.select(col("doc_id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term")))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
    val withBucket = posed
      .join(docLengths(docs), Seq("doc_id"))
      .withColumn("bucket",
        pmod(graft.ext.TextOps.hash32(col("term")), lit(buckets.toLong)))
    Layout.writePartitioned(
      withBucket.select("bucket", "term", "doc_id", "tf", "dlen", "positions"),
      s"$seg/postings", Seq("bucket"), sortCols = Seq("term", "doc_id"))
    // df = posting rows per term (one row per (doc, term)); bucket is a
    // function of term, so grouping by both is the per-term count.
    Layout.writePartitioned(
      withBucket.groupBy("bucket", "term").agg(count(lit(1)).as("df")),
      s"$seg/df", Seq("bucket"), sortCols = Seq("term"))
    docLengths(docs)
      .agg(count(lit(1)).as("n_docs"), sum(col("dlen")).as("sum_dlen"))
      .withColumn("buckets", lit(buckets))
      .write.mode("overwrite").parquet(s"$seg/meta")
  }

  private def listSegments(path: String): Seq[String] = {
    val dir = new java.io.File(s"$path/segments")
    val segs = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    require(segs.nonEmpty, s"no index segments under $path/segments")
    segs
  }

  /** Serve BM25 top-k across every segment of a segmented index. Per
    * segment the postings/df scans carry the bucket partition filter
    * (unprobed directories never opened); corpus stats and per-term df
    * recombine exactly; the df map for the |query| terms is a collected
    * CONSTANT (query-sized, the broadcast-constant pattern), so scoring
    * stays a zero-join projection over the unioned posting scans.
    */
  def bm25TopKSegmented(spark: SparkSession, path: String,
      terms: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.Row
    val segs = listSegments(path)
    val metas = segs.map(s =>
      spark.read.parquet(s"$path/segments/$s/meta").head())
    val buckets = metas.head.getAs[Int]("buckets")
    require(metas.forall(_.getAs[Int]("buckets") == buckets),
      s"segments disagree on bucket count under $path")
    val nDocs = metas.map(_.getAs[Long]("n_docs")).sum
    val avgdl = metas.map(_.getAs[Long]("sum_dlen")).sum.toDouble / nDocs
    val bs = terms.map(termBucket(_, buckets)).distinct
    def pruned(sub: String) = segs.map { s =>
      spark.read.parquet(s"$path/segments/$s/$sub")
        .where(col("bucket").isin(bs: _*) && col("term").isin(terms: _*))
    }.reduce(_ unionByName _)
    val dfMap = pruned("df").groupBy("term").agg(sum(col("df")).as("df"))
      .collect().map { case Row(t: String, df: Long) => t -> df }.toMap
    val dfCol = coalesce(
      element_at(typedLit(dfMap), col("term")), lit(0L))
    bm25FromPostings(
      pruned("postings")
        .withColumn("df", dfCol)
        .withColumn("n_docs", lit(nDocs))
        .withColumn("avgdl", lit(avgdl)))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Exact PHRASE retrieval over positional postings: documents where
    * `phrase` occurs as consecutive tokens, with the occurrence count.
    * Positional posting rows (doc_id, term, pos) are built with the
    * phrase-vocabulary filter applied map-side (same pushdown shape as
    * BM25 scoring); an occurrence is an anchor position p of the first
    * word such that word j sits at p+j for every j — checked as j−1
    * keyed self-joins on (doc_id, pos), the standard positional
    * intersection (shuffle keys are doc-position pairs, never document
    * text; a phrase of length m costs m−1 equi-joins each bounded by
    * the rarest word's posting list).
    */
  def phraseMatches(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    phraseFold(
      docs.select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term")))
        .where(col("term").isin(phrase: _*)),
      phrase)
  }

  /** Phrase retrieval served from a SEGMENTED index's positional
    * postings: reads only the phrase words' bucket directories, explodes
    * the stored position lists, and runs the same positional
    * intersection as [[phraseMatches]] — spec-proved equal to the
    * in-plan spelling on the same corpus. Documents never re-tokenize
    * at query time; the arriving rows are already (term, doc) grouped.
    */
  def phraseMatchesFromIndex(spark: SparkSession, path: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val segs = listSegments(path)
    val buckets = spark.read.parquet(s"$path/segments/${segs.head}/meta")
      .head().getAs[Int]("buckets")
    val bs = phrase.map(termBucket(_, buckets)).distinct
    val tok = segs.map { s =>
      spark.read.parquet(s"$path/segments/$s/postings")
        .where(col("bucket").isin(bs: _*) && col("term").isin(phrase: _*))
        .select(col("doc_id"), col("term"),
          explode(col("positions")).as("pos"))
    }.reduce(_ unionByName _)
    phraseFold(tok, phrase)
  }

  /** PER-ROW phrase occurrence count — the streaming/percolation
    * spelling of [[phraseMatches]]: the document's own token array is
    * zipped against itself at offsets 1..m−1 (`arrays_zip(slice, slice)`
    * — fully codegen, the lm_bigram lesson: never an interpreted
    * per-element lambda on a token stream) and consecutive windows
    * equal to the phrase are counted. A pure projection, so a standing
    * phrase query runs on an unbounded stream with no state — and
    * spec-proved to agree with the distributed positional-intersection
    * spelling row for row.
    */
  def phraseCount(textCol: org.apache.spark.sql.Column,
      phrase: Seq[String]): org.apache.spark.sql.Column = {
    require(phrase.nonEmpty, "empty phrase")
    val toks = TextOps.tokens(textCol)
    val m = phrase.length
    if (m == 1) size(filter(toks, x => x === lit(phrase.head)))
    else {
      val n1 = size(toks) - (m - 1)
      val zipped = arrays_zip(
        (0 until m).map(j => slice(toks, lit(j + 1), n1)): _*)
      val hit = filter(zipped, w =>
        (0 until m).map(j => w.getField(j.toString) === lit(phrase(j)))
          .reduce(_ && _))
      when(size(toks) >= m, size(hit)).otherwise(lit(0))
    }
  }

  /** Positional intersection over (doc_id, term, pos) rows: anchors at
    * the first word's positions, one left-semi equi-join per further
    * word at offset j.
    */
  private def phraseFold(tok: DataFrame, phrase: Seq[String]): DataFrame = {
    val anchors = tok.where(col("term") === phrase.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(anchors) {
      case (acc, (w, j)) =>
        acc.join(
          tok.where(col("term") === w)
            .select(col("doc_id"), (col("pos") - j).as("p0")),
          Seq("doc_id", "p0"), "left_semi")
    }
    matched.groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
  }

  /** Compact a segmented index: merge every segment into one. Postings
    * and dlen rows concatenate unchanged (documents are disjoint across
    * segments); per-term df rows re-sum; metas add. The result serves
    * bit-identically to the multi-segment index (same recombination
    * arithmetic, now with one term, one row in df) — compaction is the
    * read-amplification knob: s segments cost s pruned scans per query,
    * one segment costs one. Writes to a staging name then swaps, so a
    * crash never leaves a half-compacted index.
    */
  def compactSegments(spark: SparkSession, path: String,
      compactedName: String = "compacted"): Unit = {
    val segs = listSegments(path)
    require(!segs.contains(compactedName),
      s"segment name '$compactedName' already exists under $path")
    val bucketCounts = segs.map(s =>
      spark.read.parquet(s"$path/segments/$s/meta").head().getAs[Int]("buckets"))
    require(bucketCounts.distinct.size == 1,
      s"segments disagree on bucket count under $path: $bucketCounts")
    def union(sub: String) = segs.map(s =>
      spark.read.parquet(s"$path/segments/$s/$sub")).reduce(_ unionByName _)
    val staging = s"$path/_compacting/$compactedName"
    Layout.writePartitioned(union("postings"), s"$staging/postings",
      Seq("bucket"), sortCols = Seq("term", "doc_id"))
    Layout.writePartitioned(
      union("df").groupBy("bucket", "term").agg(sum(col("df")).as("df")),
      s"$staging/df", Seq("bucket"), sortCols = Seq("term"))
    union("meta")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dlen")).as("sum_dlen"),
        max(col("buckets")).as("buckets"))
      .write.mode("overwrite").parquet(s"$staging/meta")
    // swap: drop the old segments, move the staged one in
    val fs = new java.io.File(s"$path/segments")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    segs.foreach(s => rm(new java.io.File(fs, s)))
    require(new java.io.File(staging).renameTo(new java.io.File(fs, compactedName)),
      s"failed to move compacted segment into place under $path")
  }

  /** Frozen corpus statistics of a segmented index, restricted to a
    * query vocabulary: (per-term df, n_docs, avgdl). This is the
    * constant a standing query ships into [[percolate]].
    */
  def frozenStats(spark: SparkSession, path: String,
      terms: Seq[String]): (Map[String, Long], Long, Double) = {
    import org.apache.spark.sql.Row
    val segs = listSegments(path)
    val metas = segs.map(s =>
      spark.read.parquet(s"$path/segments/$s/meta").head())
    val buckets = metas.head.getAs[Int]("buckets")
    val nDocs = metas.map(_.getAs[Long]("n_docs")).sum
    val avgdl = metas.map(_.getAs[Long]("sum_dlen")).sum.toDouble / nDocs
    val bs = terms.map(termBucket(_, buckets)).distinct
    val dfMap = segs.map { s =>
      spark.read.parquet(s"$path/segments/$s/df")
        .where(col("bucket").isin(bs: _*) && col("term").isin(terms: _*))
    }.reduce(_ unionByName _)
      .groupBy("term").agg(sum(col("df")).as("df"))
      .collect().map { case Row(t: String, df: Long) => t -> df }.toMap
    (dfMap, nDocs, avgdl)
  }

  /** PERCOLATION — the standing-query direction of retrieval (the
    * Elasticsearch percolator model): score each INCOMING document
    * against a fixed query under FROZEN index statistics. Works
    * identically on a batch frame or an unbounded stream, because the
    * plan is a pure per-row projection: per-term tf is a filter over
    * the document's own token array (per-document small arrays — the
    * §8 HOF allowance), df/N/avgdl are plan constants, and each term's
    * contribution rounds to micro-units exactly like the batch scorer —
    * so a streamed document scores bit-identically to the batch
    * pipeline (spec-proved). No aggregation, no state store, no
    * watermark: percolation of a 100 TB/day firehose shards freely.
    *
    * Per-row cost is ONE tokenize + ONE array walk regardless of query
    * width: the per-term tfs (and dlen) come from the native `term_tfs`
    * kernel, whose multiple references CSE to a single evaluation under
    * whole-stage codegen — the interpreted filter-HOF spelling this
    * replaces re-tokenized per term reference (no CSE: the
    * greedy_piece_stats lesson, plan-proved in RetrievalSpec).
    */
  def percolate(docs: DataFrame, terms: Seq[String],
      dfMap: Map[String, Long], nDocs: Long, avgdl: Double): DataFrame = {
    val k = terms.length
    val stats = graft.functions.TextExpressions.term_tfs(
      TextOps.tokens(col("text")), terms)
    val dlen = element_at(stats, k + 1)
    val contribs = terms.zipWithIndex.map { case (t, j) =>
      val tf = element_at(stats, j + 1).cast("double")
      val df = lit(dfMap.getOrElse(t, 0L))
      val idf = log(lit(1.0) + (lit(nDocs) - df + lit(0.5)) / (df + lit(0.5)))
      val norm = lit(K1) * (lit(1.0 - B) + lit(B) * dlen / lit(avgdl))
      val c = idf * tf * lit(K1 + 1.0) / (tf + norm)
      struct(when(tf > 0, lit(1L)).otherwise(lit(0L)).as("m"),
        when(tf > 0, round(c * lit(1e6), 0).cast("long")).otherwise(lit(0L))
          .as("c"))
    }
    docs
      .withColumn("_cs", array(contribs: _*))
      .withColumn("n_matched",
        aggregate(col("_cs"), lit(0L), (a, x) => a + x.getField("m")))
      .where(col("n_matched") > 0)
      .select(col("doc_id"), col("n_matched"),
        (aggregate(col("_cs"), lit(0L), (a, x) => a + x.getField("c"))
          .cast("double") / lit(1e6)).as("score"))
  }
}
