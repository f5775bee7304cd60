package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-sketch join pruning — the standard way to make a
  * big-probe/small-build semi- or inner join cheap at 100 TB when the
  * build side is too large to broadcast as an exact hash table but its
  * KEY SET still fits a few megabytes of bits.
  *
  * Shape: sketch the build side's keys into a Bloom filter (a distributed
  * aggregate; only the filter — `-n*ln(fpp)/ln(2)^2` bits — ever reaches
  * the driver), embed it as a foldable literal in the probe side's scan
  * filter, and let the exact join run on the survivors. The probe-side
  * shuffle then carries `match_rate + fpp` of the corpus instead of all
  * of it; with a decontamination-style workload (tiny hit rate) that is
  * a ~100× shuffle reduction for a one-pass, no-shuffle scan cost. The
  * trailing exact join removes the Bloom's false positives, so the
  * result is bit-identical to the unpruned join (the oracle is the SAME
  * SQL as the exact spelling).
  *
  * This is the manual, cross-stage twin of Spark's own runtime row-level
  * filtering (`InjectRuntimeFilter`, which plants the same
  * `BloomFilterMightContain` expression inside one query); materializing
  * the sketch explicitly lets a pipeline build it ONCE (e.g. over a
  * benchmark corpus) and reuse it across many probe jobs.
  */
object BloomPrune {

  /** Build a Bloom filter over `keys.keyCol` (long keys) sized to the
    * observed distinct count. Two narrow build-side passes, neither
    * shuffling: sizing uses `approx_count_distinct` (a Bloom only needs an
    * UPPER bound on n — oversizing just lowers fpp — so the HLL estimate
    * padded by its error band replaces the old exact `distinct().count()`
    * shuffle), then `stat.bloomFilter` is a treeAggregate whose merged
    * result is the sketch itself, the same driver footprint as any
    * broadcast build. The serialized form is Spark's `BloomFilterImpl`
    * stream format, the one `BloomFilterMightContain` deserializes.
    */
  def buildBloom(keys: DataFrame, keyCol: String, fpp: Double = 0.01): Array[Byte] = {
    // rsd 0.02 is HLL's STANDARD error, not a bound — pad by 10% (5σ) so
    // undersizing is rare, not impossible. If the true n still exceeds the
    // sizing, the realized false-positive rate degrades above `fpp`
    // (best-effort); RESULTS stay exact either way — the trailing exact
    // join removes every false positive.
    val est = keys.select(approx_count_distinct(col(keyCol), 0.02))
      .head().getLong(0)
    val n = math.max((est * 1.10).toLong + 1L, 1L)
    val bf = keys.stat.bloomFilter(keyCol, n, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(sketch, key)` over a pre-built sketch: Spark's native
    * codegen expression with the sketch as a foldable binary literal (it
    * deserializes once per task, not per row). False positives at the
    * configured fpp; NO false negatives — safe as a pre-filter for any
    * exact join.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bloom)), Bridge.expression(key)))

  /** Exact left-semi join `probe ⋉ build` on long key `keyCol`, with the
    * probe side pre-filtered by a Bloom sketch of the build keys. Result
    * is bit-identical to `probe.join(build, keyCol, "left_semi")` — a
    * left-semi join dedups its build side by definition, so no exact
    * `distinct()` pass is spent on it (the sizing pass inside
    * [[buildBloom]] is approximate too: build-side cost is two narrow
    * scans total, zero build-side shuffles outside the join itself).
    */
  def semiJoinPruned(probe: DataFrame, build: DataFrame, keyCol: String,
      fpp: Double = 0.01): DataFrame = {
    val sketch = buildBloom(build, keyCol, fpp)
    probe.where(mightContain(sketch, col(keyCol)))
      .join(build.select(keyCol), Seq(keyCol), "left_semi")
  }
}
