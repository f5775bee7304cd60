package graft

import org.apache.spark.sql.functions._

/** Properties of the deterministic epoch-shuffle shard layout
  * (`corpus_shuffle_shards`): every doc lands exactly once, positions
  * are contiguous 1..count within each shard, the layout is
  * deterministic across runs and partitionings, and a different epoch
  * salt yields a genuinely different permutation.
  */
class ShardLayoutSpec extends SparkSpec {

  private def layout = SparkEntry.queries("corpus_shuffle_shards")(spark, sf0001)

  test("shard layout is a permutation: every doc once, contiguous positions") {
    val df = layout.cache()
    try {
      val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
      assert(df.count() == nDocs)
      assert(df.select("doc_id").distinct().count() == nDocs)
      // per shard: min pos 1, max pos == count, all distinct => contiguous
      val byShard = df.groupBy("shard")
        .agg(min("pos").as("lo"), max("pos").as("hi"),
          count(lit(1)).as("n"), countDistinct("pos").as("nd"))
        .collect()
      assert(byShard.nonEmpty && byShard.forall { r =>
        r.getAs[Long]("lo") == 1L && r.getAs[Long]("hi") == r.getAs[Long]("n") &&
          r.getAs[Long]("nd") == r.getAs[Long]("n")
      })
      assert(byShard.map(_.getAs[Int]("shard")).toSet.subsetOf((0 until 8).toSet))
    } finally df.unpersist()
  }

  test("shard layout is deterministic and partition-count invariant") {
    val a = layout.collect().toSeq
    val b = layout.repartition(7).orderBy("shard", "pos").collect().toSeq
    assert(a == b)
  }

  test("a different epoch salt permutes within-shard order") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def posFor(salt: String) = docs
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(salt))).as("h"))
      .withColumn("shard",
        (conv(substring(col("h"), 1, 2), 16, 10).cast("int") % 8))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))))
      .select("doc_id", "shard", "pos")
    val e1 = posFor(":epoch1").collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val e2 = posFor(":epoch2").collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(e1.keySet == e2.keySet)
    val moved = e1.count { case (k, v) => e2(k) != v }
    // md5 re-salting moves essentially every doc
    assert(moved > e1.size / 2, s"only $moved of ${e1.size} docs moved")
  }
}
