package graft

import org.apache.spark.sql.SparkSession

/** Session factories with the engine's recommended configuration.
  *
  * `local` mirrors the harness (Verify/Bench/tests). `clusterBuilder`
  * documents the knobs that matter when the same plans run against ~100 TB
  * on a real cluster — the engine's operators are written so that ONLY
  * configuration changes between the two.
  */
object Sessions {

  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Cluster-scale configuration, to be composed with deployment-specific
    * master/resource settings:
    *  - AQE on (default) with skew-join splitting and partition coalescing:
    *    runtime re-planning replaces hand-tuned partition counts.
    *  - shuffle.partitions sized ~2-3x total executor cores; AQE coalesces
    *    down, so err high.
    *  - files.maxPartitionBytes 256m: fewer, fuller input splits at
    *    100 TB (400k splits instead of 800k at the 128m default).
    *  - broadcast threshold stays default (10m): constant-size dims
    *    (nation/region) broadcast; anything scaling with data must not.
    *  - runtime bloom-filter join reduction ON: a selective dim filter
    *    (q3/q5-shaped joins) becomes a bloom filter pushed into the fact
    *    scan, dropping non-joining rows before the shuffle — at 100 TB
    *    that is the difference between shuffling the table and shuffling
    *    the match set.
    *  - session TZ pinned UTC for deterministic time semantics.
    *  - RocksDB state store: streaming state (watermarked dedup,
    *    sessionization, stream-stream joins) lives off-heap with
    *    incremental changelog checkpoints — at 100 TB/day the state no
    *    longer needs to fit in executor heap, and recovery replays a
    *    changelog instead of reloading full snapshots.
    */
  def clusterBuilder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "256m")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .withExtensions(new graft.functions.GraftExtensions)
}
