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
