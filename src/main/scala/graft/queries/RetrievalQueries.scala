package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ext.Retrieval

/** Full-text ranked-retrieval operators (round 8, third wave): BM25
  * scoring, conjunctive boolean retrieval, and BM25 served from the
  * materialized bucket-partitioned inverted index (`ext/Retrieval`).
  *
  * Exactness contract: per-(doc, term) BM25 contributions are rounded to
  * integer micro-units before the per-doc sum (order-independent
  * reduction; ln() ulp noise sits behind the rounding — same recipe as
  * the quality-model gradient sums). The DuckDB mirrors spell the same
  * left-to-right double expression.
  */
object RetrievalQueries extends QueryPack {

  /** Fixed query vocabulary: two common terms plus the fixture's one rare
    * term ("dup", df≈5% of docs) so idf spread is visible in the ranking.
    */
  val QueryTerms = Seq("spark", "vector", "dup")
  val TopK = 10

  /** Per-JVM scratch dir for the materialized-index query (the
    * sim_ivfpq_from_index pattern: reused across bench/probe
    * invocations), under the [[graft.TempStores]] session root so
    * Bench/Verify exit hygiene removes it.
    */
  private lazy val indexScratchDir: String =
    graft.TempStores.newStore("graft_bm25_q")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BM25 top-k: query-term filter BEFORE the posting aggregation, df as
    // a whole-partition window count on the matched postings, corpus
    // stats broadcast, global top-k as TakeOrderedAndProject.
    "text_bm25_topk" -> ((s, d) =>
      Retrieval.bm25TopK(documents(s, d), QueryTerms, TopK)),

    // Conjunctive (AND) retrieval: posting-list intersection as ONE keyed
    // aggregate (match-count == |query|), no self-joins.
    "text_bm25_conjunctive" -> ((s, d) =>
      Retrieval.conjunctive(documents(s, d), QueryTerms).orderBy("doc_id")),

    // Serve the SAME top-k from the materialized inverted index: build
    // (bucket-partitioned denormalized postings + frozen corpus stats),
    // then serve reading ONLY the query terms' bucket directories
    // (PartitionFilters). Bit-equal to the in-plan query, so the oracle
    // is identical SQL.
    "text_bm25_from_index" -> ((s, d) => {
      val path = indexScratchDir + "/index"
      // buckets0 = 0: scale-adaptive directory count (r13, guide §6) —
      // serving reads the count back from meta, results are invariant
      Retrieval.writeInvertedIndex(documents(s, d), path, buckets0 = 0)
      Retrieval.bm25TopKFromIndex(s, path, QueryTerms, TopK)
    }),

    // SEGMENTED (incremental) index serving: two ingest batches become
    // two immutable segments; df/N/avgdl recombine exactly at serve
    // time, so the result is bit-equal to a full rebuild — the oracle
    // is the same SQL as the in-plan query. Scans stay bucket-pruned
    // per segment.
    "text_bm25_segmented" -> ((s, d) => {
      val path = indexScratchDir + "/segindex"
      val docs = documents(s, d)
      // buckets0 = 0: scale-adaptive (s0 derives the count, s1 adopts it)
      Retrieval.writeIndexSegment(docs.where(col("doc_id") % 2 === 0), path,
        "s0", buckets0 = 0)
      Retrieval.writeIndexSegment(docs.where(col("doc_id") % 2 === 1), path,
        "s1", buckets0 = 0)
      Retrieval.bm25TopKSegmented(s, path, QueryTerms, TopK)
    }),

    // MORE-LIKE-THIS: document similarity served through the BM25 stack —
    // the query document's top-MltTerms non-stopword terms (by tf, ties
    // on term) become the BM25 query; the document itself is excluded
    // from the ranking. The term extraction is a 3-row driver constant
    // (the query-vector pattern the sim_* family uses); everything else
    // is the standard posting-list plan.
    "text_more_like_this" -> ((s, d) => {
      val docs = documents(s, d)
      val qterms = docs.where(col("doc_id") === MltDocId)
        .select(explode(graft.ext.TextOps.tokens(col("text"))).as("term"))
        .where(!col("term").isin(graft.ext.TextOps.stopwords: _*))
        .groupBy("term").agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("term")).limit(MltTerms)
        .collect().map(_.getString(0)).toSeq
      Retrieval.bm25Scores(docs, qterms)
        .where(col("doc_id") =!= MltDocId)
        .orderBy(col("score").desc, col("doc_id")).limit(TopK)
    }),

    // Exact PHRASE retrieval over positional postings: consecutive-token
    // occurrence counts via keyed positional intersection (m−1 equi-joins
    // on (doc, pos), phrase-vocabulary filter pushed to the token
    // stream) — the third retrieval mode beside ranked and boolean.
    "text_phrase_match" -> ((s, d) =>
      Retrieval.phraseMatches(documents(s, d), Phrase).orderBy("doc_id")),

    // HYBRID retrieval: lexical (BM25 top-HybridCand) and vector (IVF
    // cell-pruned cosine top-HybridCand; embeddings vec_id ≡ documents
    // doc_id in the fixture) candidate lists fused by reciprocal rank —
    // no score calibration across the two incomparable scales. Each
    // branch keeps its own pruned corpus-scale plan; the fusion stage is
    // candidate-sized (ext/Fusion), so the hybrid adds no data-sized
    // work to either branch.
    "hybrid_rrf_topk" -> ((s, d) => {
      val text = Retrieval.bm25TopK(documents(s, d), QueryTerms, HybridCand)
      val vec = graft.ext.Similarity.ivfTopK(embeddings(s, d), "vec_id",
        "embedding", queryId = HybridQueryId, numCells = 16, nprobe = 4,
        k = HybridCand)
      graft.ext.Fusion.rrf(Seq(
          graft.ext.Fusion.ranked(text, "doc_id",
            Seq(col("score").desc, col("doc_id"))),
          graft.ext.Fusion.ranked(vec, "vec_id",
            Seq(col("cos_sim").desc, col("vec_id")))))
        .orderBy(col("rrf").desc, col("doc_id")).limit(TopK)
    }))

  /** More-like-this query document and its query-vocabulary width. */
  val MltDocId = 1L
  val MltTerms = 3

  /** Hybrid fusion: per-branch candidate width and the vector branch's
    * query id (vec_id whose embedding is the query vector).
    */
  val HybridCand = 20
  val HybridQueryId = 0L

  /** Exact-phrase query for the positional-retrieval entry. */
  val Phrase = Seq("spark", "vector")

  private val duckToks = """string_split_regex(lower(text), '\s+')"""
  private def termList = QueryTerms.map(t => s"'$t'").mkString(", ")

  /** Shared oracle CTE chain mirroring Retrieval.bm25Scores; the query
    * vocabulary arrives as a SQL predicate fragment so the fixed-terms
    * and derived-terms (more-like-this) spellings share the chain.
    */
  private def duckBm25Chain(termPred: String = s"term IN ($termList)"): String =
    s"""tok AS (SELECT doc_id, unnest($duckToks) AS term FROM documents),
       |hit AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |        WHERE $termPred GROUP BY 1, 2),
       |dfx AS (SELECT term, count(*) AS df FROM hit GROUP BY 1),
       |dl AS (SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS dlen FROM documents),
       |st AS (SELECT count(*) AS n_docs,
       |       CAST(sum(dlen) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |c AS (SELECT h.doc_id,
       |  CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
       |    * tf * 2.2
       |    / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl)) * 1e6, 0) AS BIGINT) AS cmu
       |  FROM hit h JOIN dfx USING (term) JOIN dl USING (doc_id), st),
       |scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
       |  CAST(sum(cmu) AS DOUBLE) / 1e6 AS score FROM c GROUP BY doc_id)""".stripMargin

  private def duckBm25TopK: String =
    s"""WITH ${duckBm25Chain()}
       |SELECT doc_id, n_matched, score FROM scored
       |ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin

  private def duckMoreLikeThis: String = {
    val stop = graft.ext.TextOps.stopwords.map(w => s"'$w'")
      .mkString("[", ",", "]")
    s"""WITH qt AS (
       |  SELECT term FROM (
       |    SELECT term, count(*) AS tf FROM (
       |      SELECT unnest($duckToks) AS term FROM documents
       |      WHERE doc_id = $MltDocId)
       |    WHERE NOT list_contains($stop, term)
       |    GROUP BY term)
       |  ORDER BY tf DESC, term LIMIT $MltTerms),
       |${duckBm25Chain("term IN (SELECT term FROM qt)")}
       |SELECT doc_id, n_matched, score FROM scored
       |WHERE doc_id <> $MltDocId
       |ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin
  }

  /** Hybrid oracle: the shared BM25 chain plus a self-contained mirror
    * of Similarity.ivfAssign/ivfTopK (CTEs prefixed `v` — the assign
    * chain's own `scored` name would collide with the BM25 chain's),
    * fused with the same micro-unit 1e6/(k0+rank) contributions.
    */
  private def duckHybridRrf: String =
    s"""WITH ${duckBm25Chain()},
       |tcand AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |  FROM scored ORDER BY score DESC, doc_id LIMIT $HybridCand),
       |ve AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |       FROM embeddings),
       |vn AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |       FROM ve),
       |vcent AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cnrm FROM vn
       |          WHERE vec_id < 16),
       |vsc AS (SELECT a.vec_id, a.v, a.nrm, c.cell_id,
       |    round(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * c.cv[i]))
       |          / (a.nrm * c.cnrm), 6) AS ccos
       |  FROM vn a, vcent c),
       |vassign AS (SELECT vec_id, v, nrm, cell_id AS cell FROM vsc
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell_id) = 1),
       |vq AS (SELECT v AS qv, nrm AS qnrm FROM vn WHERE vec_id = $HybridQueryId),
       |vprobe AS (SELECT cell_id AS cell FROM vcent, vq
       |  ORDER BY round(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * qv[i]))
       |                 / (cnrm * qnrm), 6) DESC, cell_id LIMIT 4),
       |vres AS (SELECT a.vec_id AS doc_id,
       |    round(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * qv[i]))
       |          / (a.nrm * qnrm), 6) AS cos_sim
       |  FROM vassign a JOIN vprobe USING (cell), vq),
       |vcand AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS rank
       |  FROM vres ORDER BY cos_sim DESC, doc_id LIMIT $HybridCand),
       |u AS (
       |  SELECT doc_id, CAST(round(1e6 / (${graft.ext.Fusion.K0} + rank), 0) AS BIGINT) AS cmu
       |  FROM tcand
       |  UNION ALL
       |  SELECT doc_id, CAST(round(1e6 / (${graft.ext.Fusion.K0} + rank), 0) AS BIGINT)
       |  FROM vcand)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_branches,
       |  CAST(sum(cmu) AS DOUBLE) / 1e6 AS rrf
       |FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT $TopK""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "hybrid_rrf_topk" -> duckHybridRrf,
    "text_bm25_topk" -> duckBm25TopK,
    "text_bm25_from_index" -> duckBm25TopK,
    "text_bm25_segmented" -> duckBm25TopK,
    "text_more_like_this" -> duckMoreLikeThis,
    "text_phrase_match" -> {
      val conds = Phrase.zipWithIndex
        .map { case (w, j) => s"toks[i + $j] = '$w'" }.mkString(" AND ")
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  len(list_filter(generate_series(1, len(toks) - ${Phrase.length - 1}),
         |      i -> $conds)) AS n_occurrences
         |  FROM t)
         |SELECT doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences
         |FROM m WHERE n_occurrences > 0 ORDER BY doc_id""".stripMargin
    },
    "text_bm25_conjunctive" ->
      s"""WITH tok AS (SELECT doc_id, unnest($duckToks) AS term FROM documents),
         |hit AS (SELECT doc_id, term, count(*) AS tf FROM tok
         |        WHERE term IN ($termList) GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS total_tf
         |FROM hit GROUP BY doc_id HAVING count(*) = ${QueryTerms.length}
         |ORDER BY doc_id""".stripMargin)
}
