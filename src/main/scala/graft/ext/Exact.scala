package graft.ext

/** The engine's cross-engine exactness contract, in ONE place: the strict
  * left-to-right dot-product fold and the round-half-up rules every
  * driver-side constant derivation (PCA power iteration, quality-model
  * training, IVF/PQ serving constants) must share with the in-plan
  * spellings, the codegen kernels in `graft.functions` (which implement
  * the same folds over `ArrayData`), and the DuckDB oracles. A private
  * re-spelling of either rule is a place a future edit can silently
  * diverge on only some paths — e.g. switching one fold to pairwise
  * summation would break bit-identity between training and serving.
  */
object Exact {

  /** Strict left-to-right fold Σ a(i)·b(i) over the common length. */
  def ltrDot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Round-half-up to 6 places, matching Spark's `round` and DuckDB's. */
  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
