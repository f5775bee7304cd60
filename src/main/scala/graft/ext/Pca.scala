package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component extraction by POWER ITERATION — distributed
  * linear algebra as corpus aggregations, the same constant-driver-
  * traffic training pattern as `Similarity.trainPqBook` /
  * `QualityModel.train`.
  *
  * Why an analytics engine needs it: PCA is the standard embedding
  * pre-pass — dimensionality reduction and whitening before product
  * quantization (the PCA/OPQ family), drift monitoring on projected
  * coordinates, and cheap visualization. The dominant eigenvector of
  * the covariance matrix is exactly what power iteration computes, and
  * power iteration maps perfectly onto Spark: each step multiplies the
  * covariance matrix by the current vector WITHOUT materializing the
  * matrix — one pass over the vectors:
  *
  *     w = C·v = (1/n) Σ_i (x_i − μ)·((x_i − μ)ᵀ v)
  *
  * so the per-row work is a dot product (y_i = (x_i − μ)·v against the
  * broadcast v) and a scaled copy (y_i · (x_i − μ)); the reduction is a
  * per-dimension sum (dims values); driver traffic per iteration is one
  * dims-sized vector. The covariance matrix itself (dims² doubles)
  * never exists anywhere.
  *
  * Cross-engine exactness (the DuckDB oracle replays the chain): the
  * per-row per-dimension contributions are rounded to integer
  * MICRO-UNITS and summed as longs (order-independent reductions, the
  * `QualityModel`/PQ trick); means are micro-unit sums too; the
  * normalize step and all dot products are identical left-to-right IEEE
  * folds on both engines, so μ and every v_t stay bit-identical by
  * induction. v₀ = (1/8, …, 1/8) — exactly representable, unit-norm at
  * dims = 64.
  */
object Pca {

  /** Power-iteration steps for the catalog queries (determinism, not
    * convergence, is what the oracle checks; `PcaSpec` checks the
    * Rayleigh-quotient ascent property).
    */
  val PowerIters = 4

  /** Trained component: the mean vector and the unit principal
    * direction, plus the Rayleigh-quotient eigenvalue estimate
    * λ ≈ v_{t-1}ᵀ C v_{t-1} from the final step.
    */
  case class Component(mu: Array[Double], v: Array[Double], lambda: Double)

  private def ltrDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }

  /** Per-dimension micro-unit sums of `contrib(dim)` over the staged
    * vector frame: posexplode → partial-aggregated groupBy(dim) — the
    * shuffle carries dims rows per map task, never data-sized.
    */
  private def dimMicroSums(staged: DataFrame, dims: Int,
      contrib: Column => Column): Array[Long] = {
    val arr = transform(sequence(lit(0), lit(dims - 1)),
      j => round(contrib(j) * lit(1e6), 0).cast("long"))
    val rows = staged.select(posexplode(arr).as(Seq("d", "c")))
      .groupBy(col("d")).agg(sum(col("c")).as("s"))
      .collect()
    val out = Array.fill(dims)(0L)
    rows.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Mean vector + dominant principal component of `vecCol`
    * (array<float>, `dims` wide) by `iters` power-iteration steps.
    */
  def firstComponent(embeddings: DataFrame, vecCol: String, dims: Int,
      iters: Int = PowerIters): Component = {
    val staged = embeddings
      .select(Similarity.asDouble(col(vecCol)).as("vecd"))
    val n = staged.count()
    val muSums = dimMicroSums(staged, dims, j => element_at(col("vecd"), j + 1))
    val mu = muSums.map(_.toDouble / 1e6 / n)
    val muLit = typedlit(mu.toSeq)
    val centered = (j: Column) =>
      element_at(col("vecd"), j + 1) - element_at(muLit, j + 1)
    var v = Array.fill(dims)(0.125) // exactly representable unit vector at dims=64
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val vLit = typedlit(v.toSeq)
      // y = (x − μ)·v, the same ltr fold as Similarity.dot
      val y = aggregate(
        transform(sequence(lit(0), lit(dims - 1)),
          j => centered(j) * element_at(vLit, j + 1)),
        lit(0.0), (acc, x) => acc + x)
      val staged2 = staged.select(col("vecd"), y.as("y"))
      val wSums = dimMicroSums(staged2, dims, j => col("y") * centered(j))
      val w = wSums.map(_.toDouble / 1e6 / n)
      lambda = ltrDot(v, w) // Rayleigh quotient: vᵀCv for unit v
      val nw = math.sqrt(ltrDot(w, w))
      v = w.map(_ / nw)
    }
    Component(mu, v, lambda)
  }

  /** Serving: project each vector onto a (trained) component — scaler
    * and direction enter the plan as broadcast constants; a zero-shuffle
    * projection (the training→serving edge, as in `QualityModel.score`).
    */
  def project(embeddings: DataFrame, idCol: String, vecCol: String,
      c: Component): DataFrame = {
    val muLit = typedlit(c.mu.toSeq)
    val vLit = typedlit(c.v.toSeq)
    val dims = c.v.length
    val score = aggregate(
      transform(sequence(lit(0), lit(dims - 1)),
        j => (element_at(Similarity.asDouble(col(vecCol)), j + 1)
          - element_at(muLit, j + 1)) * element_at(vLit, j + 1)),
      lit(0.0), (acc, x) => acc + x)
    embeddings.select(col(idCol), round(score, 6).as("pc1"))
  }
}
