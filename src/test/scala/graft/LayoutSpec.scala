package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitioned: directory keys, pruned reads, in-file ordering") {
    val out = Files.createTempDirectory("graft_layout").toString + "/docs"
    Layout.writePartitioned(
      Tables.documents(spark, sf0001), out,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"))

    val back = spark.read.parquet(out)
    assert(back.count() == Tables.documents(spark, sf0001).count())

    // partition pruning: a lang filter reaches the scan as a PartitionFilter
    val pruned = back.where($"lang" === "en")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters, got: ${scan.partitionFilters}")
    assert(pruned.count() ==
      Tables.documents(spark, sf0001).where($"lang" === "en").count())

    // in-file clustering: doc_id is non-decreasing within each file
    val disorder = back
      .select(input_file_name().as("f"), $"doc_id")
      .withColumn("prev", lag($"doc_id", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"f").orderBy(
          monotonically_increasing_id())))
      .where($"prev" > $"doc_id")
    assert(disorder.isEmpty)
  }

  test("z-order layout prunes 2-d box predicates better than lexicographic sort") {
    // 150 users x 20 value-buckets; same file count both layouts.
    val ev = Tables.events(spark, sf0001)
      .select($"user_id".cast("long").as("x"),
        floor($"value" / 25.0).cast("long").as("y"))
    val base = Files.createTempDirectory("graft_zorder").toString
    val nFiles = 16
    Layout.writeZOrdered(ev, s"$base/z", "x", "y", numFiles = nFiles, bits = 8)
    ev.repartitionByRange(nFiles, $"x", $"y").sortWithinPartitions($"x", $"y")
      .write.parquet(s"$base/lex")

    // Files whose (min,max) envelope intersects the box — what parquet
    // footer stats let a reader skip without opening the file.
    def filesIntersecting(dir: String, xlo: Long, xhi: Long, ylo: Long, yhi: Long): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"x").as("x0"), max($"x").as("x1"), min($"y").as("y0"), max($"y").as("y1"))
        .where($"x1" >= xlo && $"x0" <= xhi && $"y1" >= ylo && $"y0" <= yhi)
        .count()

    // A y-only band: the lexicographic layout (x-leading) cannot prune it
    // — every file spans the full y range — while z-tiles bound y too.
    val zFiles = filesIntersecting(s"$base/z", 0, 1000, 2, 3)
    val lexFiles = filesIntersecting(s"$base/lex", 0, 1000, 2, 3)
    assert(lexFiles == nFiles, s"x-sorted layout should not prune a y-band ($lexFiles)")
    assert(zFiles < lexFiles, s"z=$zFiles lex=$lexFiles")
    // and the z layout still serves the x-leading box comparably.
    val zBox = filesIntersecting(s"$base/z", 40, 60, 0, 1000)
    assert(zBox < nFiles, s"z layout should bound x too ($zBox)")
    // layout changes bytes, never rows
    assert(spark.read.parquet(s"$base/z").count() == ev.count())
  }

  test("writePartitioned caps records per file") {
    val out = Files.createTempDirectory("graft_layout").toString + "/capped"
    Layout.writePartitioned(
      Tables.documents(spark, sf0001), out,
      partitionCols = Seq.empty, sortCols = Seq("doc_id"),
      maxRecordsPerFile = 10L)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name()).count().agg(max($"count")).head().getLong(0)
    assert(perFile <= 10L)
  }
}
