package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.BandedRank

class BandedRankSpec extends SparkSpec {
  import spark.implicits._

  private def bare(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy($"k")
    df.withColumn("_rank", row_number().over(w.orderBy($"v", $"id")))
      .withColumn("_n", count(lit(1)).over(w))
  }

  test("bandedRank matches the bare per-key window exactly (ties, skew)") {
    // Adversarial frame: duplicate values straddling would-be band
    // boundaries, one key with all-equal values (a single band holds the
    // whole key), one singleton key, values landing exactly ON band
    // multiples.
    val rows = Seq(
      ("a", 0.0, 1L), ("a", 0.0625, 2L), ("a", 0.0625, 3L), ("a", 0.0624, 4L),
      ("a", 0.5, 5L), ("a", 0.5, 6L), ("a", 1.9, 7L), ("a", 0.125, 8L),
      ("b", 3.3, 10L), ("b", 3.3, 11L), ("b", 3.3, 12L), ("b", 3.3, 13L),
      ("c", 7.77, 20L)
    ).toDF("k", "v", "id").repartition(4)
    val expected = bare(rows)
      .select($"id", $"_rank", $"_n").as[(Long, Int, Long)]
      .collect().map { case (id, r, n) => id -> (r.toLong, n) }.toMap
    val got = BandedRank.rank(rows, Seq("k"), $"v", $"id", bandWidth = 0.0625)
      .select($"id", $"_rank", $"_n").as[(Long, Long, Long)]
      .collect().map { case (id, r, n) => id -> (r, n) }.toMap
    assert(got == expected)
  }

  test("bandedRank matches the bare window on a real scored frame") {
    // The corpus_ppl_filter shape: per-lang rank of rounded doubles with
    // heavy cross-band ties, at a band width narrow enough that most
    // bands hold a handful of rows.
    val scored = Tables.documents(spark, sf0001)
      .select($"lang".as("k"), round($"n_chars" / 97.0, 2).as("v"),
        $"doc_id".as("id"))
    val expected = bare(scored)
      .select($"id", $"_rank", $"_n").as[(Long, Int, Long)]
      .collect().map { case (id, r, n) => id -> (r.toLong, n) }.toMap
    val got = BandedRank.rank(scored, Seq("k"), $"v", $"id", bandWidth = 0.25)
      .select($"id", $"_rank", $"_n").as[(Long, Long, Long)]
      .collect().map { case (id, r, n) => id -> (r, n) }.toMap
    assert(got == expected)
  }

  test("bandedRank rejects a non-positive band width") {
    val df = Seq(("a", 1.0, 1L)).toDF("k", "v", "id")
    intercept[IllegalArgumentException] {
      BandedRank.rank(df, Seq("k"), $"v", $"id", bandWidth = 0.0)
    }
  }
}
