package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` demonstration: numerically-stable online variance
  * (Welford/Chan parallel combination). The buffer is O(1) per group
  * (count, mean, M2) and merges associatively — the exact shape Spark's
  * partial aggregation needs: map-side partial states, one shuffle of
  * 3-double buffers, final combine.
  *
  * Spark's built-in `var_samp` covers the common case; this exists as the
  * engine's template for typed custom aggregations (the reference needs
  * none — SURVEY §2.8 — but the extension surface, e.g. custom sketches,
  * builds on this pattern).
  */
case class VarBuf(n: Long, mean: Double, m2: Double)

object WelfordVariance extends Aggregator[Double, VarBuf, Double] {
  override def zero: VarBuf = VarBuf(0L, 0.0, 0.0)

  override def reduce(b: VarBuf, x: Double): VarBuf = {
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    VarBuf(n, mean, b.m2 + d * (x - mean))
  }

  override def merge(a: VarBuf, b: VarBuf): VarBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      VarBuf(n, a.mean + d * b.n / n, a.m2 + b.m2 + d * d * a.n * b.n / n)
    }
  }

  override def finish(r: VarBuf): Double =
    if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)

  override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
