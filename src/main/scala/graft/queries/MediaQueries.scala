package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ext.Multimodal

/** Perceptual-hash media operators (round 8, wave 7): the oracle-checked
  * stub twins of the real-image `Multimodal.imageAHash` /
  * `imageNearDupPairs` kernels (which are spec-tested pixel-exact but not
  * DuckDB-expressible — DuckDB can't decode PNG bytes). The stub raster
  * is the documents payload, as in the decode/resize/frames family, so
  * every arithmetic step of the aHash pipeline — grid bucketing, exact
  * cross-multiplied mean threshold, bit packing, banded candidate join,
  * Hamming verify — gets a hash-matched DuckDB mirror.
  */
object MediaQueries extends QueryPack {

  /** Exact-recall banding: 4 bands of 16 bits over the 64-bit sketch —
    * hamming ≤ 3 pigeonholes into at least one identical band.
    */
  val AHashMaxHamming = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The 64-bit stub aHash sketch itself: cell sums are a partial-
    // aggregable groupBy (map-side combine eats the char explode), the
    // doc totals one keyed window on the 64-rows/doc cell frame, the bit
    // pack a second keyed agg — shuffle is O(cells) = 64 rows/doc at any
    // media size.
    "multimodal_ahash" -> ((s, d) =>
      Multimodal.stubAHash(documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Difference hash on the stub raster — the gradient companion of
    // aHash (dHash survives global level changes AND is sensitive to
    // structure the global-mean threshold washes out); 72-cell grid,
    // adjacent-cell cross-multiplied compares, same shuffle bound (72
    // cell rows/doc at any media size). Brightness invariance is the
    // same integer identity, spec-asserted.
    "multimodal_dhash" -> ((s, d) =>
      Multimodal.stubDHash(documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Brightness-invariance pairs: corpus ∪ uniformly-shifted twins
    // (every byte +1 — the stub form of a brightness change), sketches
    // banded 4×16 bits, candidates joined on band keys, verified by
    // codegen bit_count — the simhash-pairs plan shape on the image
    // sketch. aHash is algebraically invariant under the shift
    // (cross-multiplied threshold cancels it), so every document meets
    // its twin at hd=0: the perceptual-hash robustness property as a
    // deterministic, hash-checkable result. Twin ids are doc_id+10^9 —
    // disjoint from any corpus id, and id_a<id_b keeps orientation.
    "multimodal_ahash_pairs" -> ((s, d) => {
      val docs = documents(s, d)
      val shifted = docs.select(
        (col("doc_id") + lit(1000000000L)).as("doc_id"),
        Multimodal.brightnessShift(col("text")).as("text"))
      val corpus = docs.select(col("doc_id"), col("text")).unionAll(shifted)
      // Sketch frame is 24 B/doc — checkpoint it rather than re-running
      // the char explode per join branch (the §8 localCheckpoint rule).
      val sk = Multimodal.stubAHash(corpus, "doc_id", "text")
        .localCheckpoint(false)
      val bandCols = (0 until 4).map { bix =>
        val half = if (bix < 2) col("ahash_lo") else col("ahash_hi")
        struct(lit(bix).as("band_ix"),
          shiftright(half, (bix % 2) * 16).bitwiseAND(lit(65535L))
            .as("band_key"))
      }
      val b = sk
        .select(col("doc_id"), col("ahash_lo"), col("ahash_hi"),
          explode(array(bandCols: _*)).as("_b"))
        .select(col("doc_id"), col("ahash_lo"), col("ahash_hi"),
          col("_b.band_ix").as("band_ix"), col("_b.band_key").as("band_key"))
      val l = b.select(col("band_ix"), col("band_key"),
        col("doc_id").as("id_a"), col("ahash_lo").as("_la"),
        col("ahash_hi").as("_ha"))
      val r = b.select(col("band_ix"), col("band_key"),
        col("doc_id").as("id_b"), col("ahash_lo").as("_lb"),
        col("ahash_hi").as("_hb"))
      l.join(r, Seq("band_ix", "band_key"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (bit_count(col("_la").bitwiseXOR(col("_lb"))) +
            bit_count(col("_ha").bitwiseXOR(col("_hb")))).cast("long")
            .as("hd"))
        .where(col("hd") <= AHashMaxHamming)
        .distinct()
        .orderBy("id_a", "id_b")
    }),

    // Video perceptual dedup, stub twin of Multimodal.videoNearDupPairs:
    // each document becomes a 4-"frame" video (equal integer-boundary
    // substrings — f*n div 4, exact in both engines), each frame gets the
    // frame-keyed stub aHash, and candidates must collide on
    // (frame_ix, band_ix, band_key) — TEMPORAL banding: the same time
    // slot sharing a 16-bit band (pigeonhole-exact at hd ≤ 3). Verified
    // frame matches then take a strict MAJORITY vote over the aligned
    // slot count. The planted twins (doc_id+10^9) brightness-shift
    // frames 0-2 (aHash-invariant — the cross-multiplied threshold
    // cancels a uniform shift) and REVERSE frame 3 (a content change),
    // so a twin meets its original at 3-of-4 — a re-encode with one
    // damaged frame reads as a duplicate; half-replaced content would
    // not. Shuffle is O(4·64 cell rows/doc) at any media size.
    "video_ahash_pairs" -> ((s, d) => {
      val docs = documents(s, d)
      val origFr = docs
        .select(col("doc_id"), col("text").as("_t"),
          length(col("text")).cast("long").as("n"),
          explode(sequence(lit(0L), lit(3L))).as("frame_ix"))
        .select(col("doc_id"), col("frame_ix"),
          expr("""substring(_t, cast(frame_ix * n div 4 + 1 as int),
                 | cast((frame_ix + 1) * n div 4
                 |      - frame_ix * n div 4 as int))""".stripMargin)
            .as("text"))
      val twinFr = origFr.select(
        (col("doc_id") + lit(1000000000L)).as("doc_id"), col("frame_ix"),
        when(col("frame_ix") < 3, Multimodal.brightnessShift(col("text")))
          .otherwise(reverse(col("text"))).as("text"))
      // 24 B/frame sketch — checkpoint once, feed both join branches
      val sk = Multimodal.stubFrameAHash(origFr.unionAll(twinFr))
        .localCheckpoint(false)
      val nFrames = sk.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
      val bandCols = (0 until 4).map { bix =>
        val half = if (bix < 2) col("ahash_lo") else col("ahash_hi")
        struct(lit(bix).as("band_ix"),
          shiftright(half, (bix % 2) * 16).bitwiseAND(lit(65535L))
            .as("band_key"))
      }
      val b = sk
        .select(col("doc_id"), col("frame_ix"), col("ahash_lo"),
          col("ahash_hi"), explode(array(bandCols: _*)).as("_b"))
        .select(col("doc_id"), col("frame_ix"), col("ahash_lo"),
          col("ahash_hi"),
          col("_b.band_ix").as("band_ix"), col("_b.band_key").as("band_key"))
      val l = b.select(col("frame_ix"), col("band_ix"), col("band_key"),
        col("doc_id").as("id_a"), col("ahash_lo").as("_la"),
        col("ahash_hi").as("_ha"))
      val r = b.select(col("frame_ix"), col("band_ix"), col("band_key"),
        col("doc_id").as("id_b"), col("ahash_lo").as("_lb"),
        col("ahash_hi").as("_hb"))
      val matched = l.join(r, Seq("frame_ix", "band_ix", "band_key"))
        .where(col("id_a") < col("id_b"))
        .where(bit_count(col("_la").bitwiseXOR(col("_lb"))) +
          bit_count(col("_ha").bitwiseXOR(col("_hb"))) <= AHashMaxHamming)
        .select(col("id_a"), col("id_b"), col("frame_ix"))
        .distinct() // several bands may collide — count the frame once
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_matched"))
      matched
        .join(nFrames.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("nf", "n_a"), Seq("id_a"))
        .join(nFrames.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("nf", "n_b"), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          least(col("n_a"), col("n_b")).as("n_aligned"), col("n_matched"))
        .where(col("n_matched") * 2 > col("n_aligned"))
        .orderBy("id_a", "id_b")
    }),

    // INCREMENTAL perceptual media dedup lifecycle: the corpus arrives
    // in 3 out-of-id-order batches (arrival key arr = (doc_id%3)·1e10 +
    // doc_id — a total order that interleaves ids across batches, and
    // batch i's arr range [i·1e10, …] keeps ranges nondecreasing across
    // ingests, the ingestMediaHashBatch contract), each ingested against
    // the on-disk hash store of everything seen before via
    // Multimodal.ingestMediaHashBatch. Because the store keeps every
    // ingested hash (rejects included — near-duplication is not
    // transitive), the decisions have a batch-split-independent closed
    // form — doc b is a dup iff some a with arr_a < arr_b is within
    // hd ≤ 3, dup_of = the earliest-arrived match — which is exactly
    // what the oracle computes in one shot. The dedup_clusters_
    // incremental class: per-batch cost flat as the store grows, the
    // history contributes band keys only, never a pairwise scan.
    //
    // PLANTED TWINS (r9 advice): the raw fixture has no pairs within
    // hd ≤ 3, so without twins the decision set is empty at every SF and
    // the oracle check is vacuous. Each doc gets an aHash-invariant
    // brightness-shifted twin at doc_id+10^9; twin batch is
    // (doc_id+1)%3 ≠ doc_id%3 (10^9 ≡ 1 mod 3), so every {doc, twin}
    // pair crosses a batch boundary — the store path, not just the
    // in-batch join, carries the hd=0 match, and whichever of the pair
    // arrives second must name the first as dup_of. ~1 decision row per
    // document; cross-doc hashes stay > 3 apart (shift invariance
    // preserves all pairwise distances).
    "media_dedup_incremental" -> ((s, d) => {
      val store =
        graft.TempStores.newStore("graft_media_store") + "/hashes"
      val docs = documents(s, d)
      val corpus = docs.select(col("doc_id"), col("text")).unionAll(
        docs.select((col("doc_id") + lit(1000000000L)).as("doc_id"),
          Multimodal.brightnessShift(col("text")).as("text")))
      val sk = Multimodal.stubAHash(corpus, "doc_id", "text")
        .select(col("doc_id"),
          ((col("doc_id") % 3) * lit(10000000000L) + col("doc_id")).as("arr"),
          col("ahash_lo"), col("ahash_hi"))
        .localCheckpoint(false) // 32 B/doc sketch, feeds all 3 ingests
      (0 until 3).map { i =>
          Multimodal.ingestMediaHashBatch(s, store,
            sk.where(col("doc_id") % 3 === i), AHashMaxHamming)
        }.reduce(_ unionByName _)
        .orderBy("doc_id")
    }))

  def oracleSql: Map[String, String] = {
    // DuckDB mirror of [[Multimodal.brightnessShift]]: +1 on chars
    // 32..125 ONLY, out-of-domain chars pass through — exactly
    // translate's bounded char map. The old chr(ascii(c)+1)-on-every-
    // char spelling computed a DIFFERENT function that agreed only
    // because fixture text stays within [32,121]; '~' (126), control
    // chars, or non-ASCII would silently break hash parity (r9 advice).
    def duckShift(c: String): String =
      s"(CASE WHEN ascii($c) BETWEEN 32 AND 125 THEN chr(ascii($c) + 1) ELSE $c END)"
    val shiftedText =
      s"""array_to_string(
         |      list_transform(generate_series(1, length(text)),
         |        i -> ${duckShift("substr(text, CAST(i AS INT), 1)")}), '')""".stripMargin
    val ahashCte =
      """px AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    unnest(generate_series(0, length(text) - 1)) AS i
        |  FROM corpus WHERE length(text) > 0),
        |cells AS (
        |  SELECT doc_id, (i * 64) // n AS b,
        |    sum(CAST(ascii(substr(text, CAST(i + 1 AS INT), 1)) AS BIGINT)) AS s,
        |    count(*) AS c
        |  FROM px GROUP BY 1, 2),
        |tt AS (
        |  SELECT doc_id, b, s, c,
        |    sum(s) OVER (PARTITION BY doc_id) AS ts,
        |    sum(c) OVER (PARTITION BY doc_id) AS tc
        |  FROM cells),
        |ah AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s * tc > ts * c AND b < 32
        |         THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END)
        |      AS BIGINT) AS ahash_lo,
        |    CAST(sum(CASE WHEN s * tc > ts * c AND b >= 32
        |         THEN (CAST(1 AS BIGINT) << CAST(b - 32 AS INT)) ELSE 0 END)
        |      AS BIGINT) AS ahash_hi
        |  FROM tt GROUP BY doc_id)""".stripMargin
    Map(
      "multimodal_ahash" ->
        s"""WITH corpus AS (SELECT doc_id, text FROM documents),
           |$ahashCte
           |SELECT doc_id, ahash_lo, ahash_hi FROM ah ORDER BY doc_id""".stripMargin,

      "multimodal_dhash" ->
        """WITH px AS (
          |  SELECT doc_id, text, length(text) AS n,
          |    unnest(generate_series(0, length(text) - 1)) AS i
          |  FROM documents WHERE length(text) > 0),
          |cells AS (
          |  SELECT doc_id, (i * 72) // n AS b,
          |    sum(CAST(ascii(substr(text, CAST(i + 1 AS INT), 1)) AS BIGINT))
          |      AS s,
          |    count(*) AS c
          |  FROM px GROUP BY 1, 2),
          |bits AS (
          |  SELECT l.doc_id, (l.b // 9) * 8 + l.b % 9 AS bx,
          |    l.s * r.c > r.s * l.c AS bit
          |  FROM cells l JOIN cells r
          |    ON r.doc_id = l.doc_id AND r.b = l.b + 1
          |  WHERE l.b % 9 < 8)
          |SELECT doc_id,
          |  CAST(sum(CASE WHEN bit AND bx < 32
          |       THEN (CAST(1 AS BIGINT) << CAST(bx AS INT)) ELSE 0 END)
          |    AS BIGINT) AS dhash_lo,
          |  CAST(sum(CASE WHEN bit AND bx >= 32
          |       THEN (CAST(1 AS BIGINT) << CAST(bx - 32 AS INT)) ELSE 0 END)
          |    AS BIGINT) AS dhash_hi
          |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "multimodal_ahash_pairs" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000000, $shiftedText
           |  FROM documents),
           |$ahashCte,
           |bands AS (
           |  SELECT doc_id, ahash_lo, ahash_hi, band_ix,
           |    CASE WHEN band_ix < 2 THEN (ahash_lo >> (band_ix * 16)) & 65535
           |         ELSE (ahash_hi >> ((band_ix - 2) * 16)) & 65535 END AS band_key
           |  FROM ah, (SELECT unnest(generate_series(0, 3)) AS band_ix)),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           |         a.ahash_lo AS la, a.ahash_hi AS ha,
           |         b.ahash_lo AS lb, b.ahash_hi AS hb
           |  FROM bands a JOIN bands b USING (band_ix, band_key)
           |  WHERE a.doc_id < b.doc_id)
           |SELECT id_a, id_b,
           |  CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hd
           |FROM cand
           |WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= $AHashMaxHamming
           |ORDER BY id_a, id_b""".stripMargin,

      "video_ahash_pairs" ->
        s"""WITH fr0 AS (
           |  SELECT doc_id, ff.f AS frame_ix,
           |    substr(text, CAST((ff.f * length(text)) // 4 + 1 AS INT),
           |      CAST(((ff.f + 1) * length(text)) // 4
           |           - (ff.f * length(text)) // 4 AS INT)) AS text
           |  FROM documents, (SELECT unnest(generate_series(0, 3)) AS f) ff),
           |frames AS (
           |  SELECT doc_id, frame_ix, text FROM fr0
           |  UNION ALL
           |  SELECT doc_id + 1000000000, frame_ix,
           |    CASE WHEN frame_ix < 3 THEN $shiftedText
           |    ELSE reverse(text) END
           |  FROM fr0),
           |px AS (
           |  SELECT doc_id, frame_ix, text, length(text) AS n,
           |    unnest(generate_series(0, length(text) - 1)) AS i
           |  FROM frames WHERE length(text) > 0),
           |cells AS (
           |  SELECT doc_id, frame_ix, (i * 64) // n AS b,
           |    sum(CAST(ascii(substr(text, CAST(i + 1 AS INT), 1)) AS BIGINT))
           |      AS s,
           |    count(*) AS c
           |  FROM px GROUP BY 1, 2, 3),
           |tt AS (
           |  SELECT doc_id, frame_ix, b, s, c,
           |    sum(s) OVER (PARTITION BY doc_id, frame_ix) AS ts,
           |    sum(c) OVER (PARTITION BY doc_id, frame_ix) AS tc
           |  FROM cells),
           |ah AS (
           |  SELECT doc_id, frame_ix,
           |    CAST(sum(CASE WHEN s * tc > ts * c AND b < 32
           |         THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END)
           |      AS BIGINT) AS ahash_lo,
           |    CAST(sum(CASE WHEN s * tc > ts * c AND b >= 32
           |         THEN (CAST(1 AS BIGINT) << CAST(b - 32 AS INT)) ELSE 0 END)
           |      AS BIGINT) AS ahash_hi
           |  FROM tt GROUP BY 1, 2),
           |nf AS (SELECT doc_id, count(*) AS nf FROM ah GROUP BY 1),
           |bands AS (
           |  SELECT doc_id, frame_ix, ahash_lo, ahash_hi, band_ix,
           |    CASE WHEN band_ix < 2 THEN (ahash_lo >> (band_ix * 16)) & 65535
           |         ELSE (ahash_hi >> ((band_ix - 2) * 16)) & 65535 END
           |      AS band_key
           |  FROM ah, (SELECT unnest(generate_series(0, 3)) AS band_ix)),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, frame_ix
           |  FROM bands a JOIN bands b USING (frame_ix, band_ix, band_key)
           |  WHERE a.doc_id < b.doc_id
           |    AND bit_count(xor(a.ahash_lo, b.ahash_lo))
           |      + bit_count(xor(a.ahash_hi, b.ahash_hi)) <= $AHashMaxHamming),
           |mt AS (SELECT id_a, id_b, count(*) AS n_matched
           |  FROM cand GROUP BY 1, 2)
           |SELECT id_a, id_b, least(na.nf, nb.nf) AS n_aligned, n_matched
           |FROM mt JOIN nf na ON na.doc_id = id_a
           |        JOIN nf nb ON nb.doc_id = id_b
           |WHERE n_matched * 2 > least(na.nf, nb.nf)
           |ORDER BY id_a, id_b""".stripMargin,

      "media_dedup_incremental" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000000, $shiftedText
           |  FROM documents),
           |$ahashCte,
           |ar AS (
           |  SELECT doc_id, (doc_id % 3) * 10000000000 + doc_id AS arr,
           |    ahash_lo, ahash_hi
           |  FROM ah),
           |bands AS (
           |  SELECT doc_id, arr, ahash_lo, ahash_hi, band_ix,
           |    CASE WHEN band_ix < 2 THEN (ahash_lo >> (band_ix * 16)) & 65535
           |         ELSE (ahash_hi >> ((band_ix - 2) * 16)) & 65535 END
           |      AS band_key
           |  FROM ar, (SELECT unnest(generate_series(0, 3)) AS band_ix)),
           |cand AS (
           |  SELECT DISTINCT b.doc_id AS doc_id, a.doc_id AS id_a,
           |    a.arr AS arr_a,
           |    CAST(bit_count(xor(a.ahash_lo, b.ahash_lo))
           |       + bit_count(xor(a.ahash_hi, b.ahash_hi)) AS BIGINT) AS hd
           |  FROM bands a JOIN bands b USING (band_ix, band_key)
           |  WHERE a.arr < b.arr
           |    AND bit_count(xor(a.ahash_lo, b.ahash_lo))
           |      + bit_count(xor(a.ahash_hi, b.ahash_hi)) <= $AHashMaxHamming)
           |SELECT doc_id, id_a AS dup_of, hd FROM cand
           |QUALIFY row_number() OVER (PARTITION BY doc_id
           |  ORDER BY arr_a, id_a) = 1
           |ORDER BY doc_id""".stripMargin)
  }
}
