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
    }))

  def oracleSql: Map[String, String] = {
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
           |  SELECT doc_id + 1000000000, array_to_string(
           |      list_transform(generate_series(1, length(text)),
           |        i -> chr(ascii(substr(text, CAST(i AS INT), 1)) + 1)), '')
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
           |ORDER BY id_a, id_b""".stripMargin)
  }
}
