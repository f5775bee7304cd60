package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming Type-2 dimension maintenance: each micro-batch of change
  * events folds into a persisted [[graft.ops.ScdStore]] via
  * `foreachBatch` — the manifest watermark makes a failure-replayed
  * epoch a no-op (effectively exactly-once), and after any prefix of
  * batches the folded dimension equals `Scd.type2` over the union of
  * accepted rows (`ScdStoreSpec` equality proof; the streaming query is
  * the same code path with Spark supplying `batchId`).
  */
object ScdStream {

  def dimIngest(changes: DataFrame, storePath: String, key: String,
      time: String, tieBreak: String, attr: String): DataStreamWriter[Row] =
    changes.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.ops.ScdStore.ingestBatch(batch.sparkSession, storePath, batch,
        key, time, tieBreak, attr, batchId)
    }
}
