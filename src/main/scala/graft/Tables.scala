package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.apache.spark.sql.Column

/** Fixture-table loader + shared column helpers.
  *
  * All harness queries read the driver-generated parquet corpus
  * (`/root/testdata/sf*`; see TESTDATA.md). Loading is centralized here so
  * every query benefits from the same conventions: parquet scans (column
  * pruning + predicate pushdown are free), no caching unless a query reuses
  * a frame twice in one plan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is NANOS-precision parquet, which Spark rejects by default
    * ([PARQUET_TYPE_ILLEGAL]). Read it as a long (legacy conf, dynamic) and
    * normalize to a µs TimestampType — matching what DuckDB sees. The
    * ns→µs step uses integer `div` (not `/`): these values are ~1.7e18 and
    * double division would lose low bits, flipping ms-boundary values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Epoch milliseconds of a timestamp column, robust to the parquet column
    * being read as TIMESTAMP or TIMESTAMP_NTZ (session TZ is pinned UTC, so
    * the NTZ→LTZ cast is the identity and matches DuckDB's `epoch_ms`).
    */
  def tsMillis(c: Column): Column = unix_millis(c.cast(TimestampType))
}
