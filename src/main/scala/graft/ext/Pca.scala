package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PcaExpressions._

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
  * Per-row math runs in the native `functions/PcaExpressions` kernels
  * (one array read per row; the declarative aggregate/transform
  * spelling was CodegenFallback AND — through CollapseProject inlining
  * of chained deflation arrays into per-element reads — exponential in
  * the number of deflation layers; the kernels keep chained recompute
  * O(layers · dims) per row with no pinned storage).
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

  private def ltrDot(a: Array[Double], b: Array[Double]): Double =
    Exact.ltrDot(a, b)

  /** Per-dimension sums of a micro-unit array column, plus the row
    * count (free from the same aggregation): posexplode →
    * partial-aggregated groupBy(dim) — the shuffle carries dims rows
    * per map task, never data-sized.
    */
  private def dimMicroSums(staged: DataFrame, dims: Int,
      microArr: Column): (Long, Array[Long]) = {
    val rows = staged.select(posexplode(microArr).as(Seq("d", "c")))
      .groupBy(col("d")).agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
      .collect()
    val out = Array.fill(dims)(0L)
    var n = 0L
    rows.foreach { r => out(r.getInt(0)) = r.getLong(1); n = r.getLong(2) }
    (n, out)
  }

  /** Mean vector + dominant principal component of `vecCol`
    * (array<float>, `dims` wide) by `iters` power-iteration steps.
    */
  def firstComponent(embeddings: DataFrame, vecCol: String, dims: Int,
      iters: Int = PowerIters): Component = {
    val staged = embeddings
      .select(Similarity.asDouble(col(vecCol)).as("vecd"))
    val (n, muSums) = dimMicroSums(staged, dims,
      vec_micro(col("vecd"), dims))
    require(n > 0, "firstComponent: empty vector frame")
    val mu = muSums.map(_.toDouble / 1e6 / n)
    var v = Array.fill(dims)(0.125) // exactly representable unit vector at dims=64
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val (_, wSums) = dimMicroSums(staged, dims,
        pca_centered_contrib_micro(col("vecd"), mu, v))
      val w = wSums.map(_.toDouble / 1e6 / n)
      lambda = ltrDot(v, w) // Rayleigh quotient: vᵀCv for unit v
      val nw = math.sqrt(ltrDot(w, w))
      v = w.map(_ / nw)
    }
    Component(mu, v, lambda)
  }

  /** Top-`k` components by DEFLATION: after each component v_c the
    * centered data is replaced by its residual x ← x − (x·v_c)·v_c (a
    * pure per-row projection chained into the plan — the residual
    * array is never written anywhere; each native kernel reads its
    * input array once, so recomputing the chain costs O(layers · dims)
    * per row), and power iteration repeats on the residual. Classic
    * sequential PCA; k·iters corpus passes total, driver traffic stays
    * one dims-vector per pass.
    *
    * Exactness: the deflation projection uses the same ltr dot and
    * exact-rounded elementwise ops as everything else, so the residual
    * stream — and with it every later component — stays bit-identical
    * to the oracle replay by induction.
    */
  def topComponents(embeddings: DataFrame, vecCol: String, dims: Int, k: Int,
      iters: Int = PowerIters): (Array[Double], Seq[(Array[Double], Double)]) = {
    val staged0 = embeddings
      .select(Similarity.asDouble(col(vecCol)).as("vecd"))
    val (n, muSums) = dimMicroSums(staged0, dims,
      vec_micro(col("vecd"), dims))
    require(n > 0, "topComponents: empty vector frame")
    val mu = muSums.map(_.toDouble / 1e6 / n)
    var frame = staged0.select(vec_center(col("vecd"), mu).as("xc"))
    val comps = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
    for (_ <- 0 until k) {
      var v = Array.fill(dims)(0.125)
      var lambda = 0.0
      for (_ <- 1 to iters) {
        val (_, wSums) = dimMicroSums(frame, dims,
          pca_contrib_micro(col("xc"), v))
        val w = wSums.map(_.toDouble / 1e6 / n)
        lambda = ltrDot(v, w)
        val nw = math.sqrt(ltrDot(w, w))
        v = w.map(_ / nw)
      }
      comps += ((v, lambda))
      // deflate: xc ← xc − (xc·v)·v, chained as a projection
      frame = frame.select(pca_deflate(col("xc"), v).as("xc"))
    }
    (mu, comps.toSeq)
  }

  /** Serving for [[topComponents]]: reduce each vector to its k
    * component coordinates (long form: one row per (vector, component))
    * — the dimensionality-reduction artifact itself, a zero-shuffle
    * projection against broadcast constants.
    */
  def reduce(embeddings: DataFrame, idCol: String, vecCol: String,
      mu: Array[Double], comps: Seq[Array[Double]]): DataFrame = {
    require(comps.nonEmpty, "reduce: no components given")
    // residual chain: coord_c is the dot against v_c of the residual
    // AFTER deflating components 0..c-1 (matches training exactly)
    var cur = embeddings.select(col(idCol),
      vec_center(Similarity.asDouble(col(vecCol)), mu).as("xc"))
    val out = comps.zipWithIndex.map { case (v, c) =>
      val coords = cur.select(col(idCol), lit(c).as("comp"),
        round(pca_dot(col("xc"), v), 6).as("coord"))
      cur = cur.select(col(idCol), pca_deflate(col("xc"), v).as("xc"))
      coords
    }
    out.reduce(_ union _)
  }

  /** Serving: project each vector onto a (trained) component — scaler
    * and direction enter the plan as broadcast constants; a zero-shuffle
    * projection (the training→serving edge, as in `QualityModel.score`).
    */
  def project(embeddings: DataFrame, idCol: String, vecCol: String,
      c: Component): DataFrame =
    embeddings.select(col(idCol),
      round(pca_centered_dot(Similarity.asDouble(col(vecCol)), c.mu, c.v), 6)
        .as("pc1"))
}
