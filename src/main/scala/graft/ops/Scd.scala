package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) builder — turn a change-event feed
  * into versioned validity intervals per key.
  *
  * Given rows (key, time, tieBreak, attr...), keep only CHANGE POINTS
  * (rows whose tracked attribute differs from the key's previous row),
  * number them as versions, and close each interval with the next
  * change's time (`valid_to` null = current version). Intervals tile each
  * key's timeline by construction, so a point-in-time lookup is a plain
  * as-of backward join on `valid_from` ([[AsOfJoin.backward]]) — no
  * interval cross-product ever.
  *
  * Physical shape: ONE shuffle on the key. All three window passes (lag
  * for change detection, row_number + lead for versioning) share the same
  * `PARTITION BY key` — Catalyst reuses the exchange and the later passes
  * run over the already-filtered change points, so the marginal cost of
  * versioning is an in-partition sort of the (much smaller) change set.
  * Per-key state in any executor is bounded by that key's change count,
  * never the fact volume.
  */
object Scd {

  /** @param changes  change feed; must contain `key`, `time`, `tieBreak`
    *                 and `attr` columns
    * @param key      dimension key column
    * @param time     event-time column (any orderable type)
    * @param tieBreak deterministic tie-break column for equal times
    * @param attr     tracked attribute column; a new version starts when
    *                 it differs from the key's previous value
    * @return (key, version, attr, valid_from, valid_to) — `valid_from` =
    *         the change's `time`, `valid_to` = next change's `time` or
    *         null for the open current version
    */
  def type2(changes: DataFrame, key: String, time: String, tieBreak: String,
      attr: String, keepTieBreak: Boolean = false): DataFrame = {
    val byTime = Window.partitionBy(col(key)).orderBy(col(time), col(tieBreak))
    // lag over a STRUCT wrapper: null means "no previous row" even when
    // the attribute itself is null, so a leading null-attr run collapses
    // to one version instead of one per row
    val cp = changes
      .withColumn("_prev", lag(struct(col(attr)), 1).over(byTime))
      .where(col("_prev").isNull || !(col("_prev")(attr) <=> col(attr)))
    val out = cp.withColumn("version", row_number().over(byTime))
      .withColumn("valid_to", lead(col(time), 1).over(byTime))
    // keepTieBreak: incremental maintenance (ScdStore) re-sorts stored
    // change points against later batches, so each version keeps the
    // tie-break of the row that opened it
    val cols = Seq(col(key), col("version"), col(attr),
      col(time).as("valid_from"), col("valid_to")) ++
      (if (keepTieBreak) Seq(col(tieBreak)) else Nil)
    out.select(cols: _*)
  }
}
