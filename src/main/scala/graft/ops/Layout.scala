package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Output-layout control for pipeline sinks — at 100 TB the layout of
  * what you WRITE decides the cost of every later read.
  *
  * The reference's only sinks are one-row CSV appends; an engine feeding
  * training pipelines needs real table layout: partition pruning for
  * selective reads (`partitionBy`), clustering within files for range
  * scans and better compression (`sortWithinPartitions`), and bounded
  * file sizes so a skewed partition can't produce one giant file
  * (`maxRecordsPerFile`).
  */
object Layout {

  /** Write `df` as a partitioned, internally-sorted parquet table.
    *
    *  - `partitionCols` become directory keys: readers filtering on them
    *    scan only matching directories (partition pruning, visible as
    *    `PartitionFilters` in the scan node).
    *  - `sortCols` cluster rows inside each output file: parquet min/max
    *    page stats make range predicates skip pages, and sorted columns
    *    compress better.
    *  - `maxRecordsPerFile` caps file size without a global repartition;
    *    0 = no cap.
    *
    * `repartition(partitionCols)` first, so each task writes at most one
    * file per partition key instead of every task writing a sliver of
    * every key (the small-files explosion).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String], maxRecordsPerFile: Long = 0L,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val arranged = df
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    val writer = arranged.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }

  /** Write `df` as a bucketed + sorted managed table (Hive-style layout):
    * joins and aggregations on `bucketCols` against another table bucketed
    * the same way need NO shuffle — the bucketing is a persisted
    * hash-partitioning (see BucketingSpec for the shuffle-free plan
    * proof).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy((bucketCols ++ sortCols).head, (bucketCols ++ sortCols).tail: _*)
      .saveAsTable(table)
}
