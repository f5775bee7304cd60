package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.Metrics
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY §2 (plus the north-star extension surface) is
  * exposed as a named query over the fixture tables, each with matching
  * ANSI SQL the driver runs in DuckDB on the same parquet. Column names and
  * rounding are aligned on both sides (the driver sorts columns by name
  * and hashes values). Queries live in `graft.queries.*` packs; this object
  * merges them.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(ParityQueries, RelationalQueries, ExtensionQueries, AnalyticsQueries,
      CoverageQueries, FunctionSurfaceQueries, PipelineQueries, CorpusQueries,
      RetrievalQueries, GraphQueries, WarehouseQueries, EvalQueries,
      MediaQueries)

  /** Flagship: batch-replay of the streaming metrics pipeline
    * (spark_stream_metrics.py write_batch, single-pass form) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Metrics.bucketedMetrics(events(spark, "/root/testdata/sf0.001"), col("ts"),
        ParityQueries.NowMs, ParityQueries.TriggerSec)
      .orderBy("batch_epoch_sec")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
