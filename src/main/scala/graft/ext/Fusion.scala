package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion — the standard way a hybrid retrieval stack
  * combines lexical (BM25) and vector (ANN) candidate lists without
  * calibrating their incomparable score scales: each branch contributes
  * 1/(k0 + rank) for the documents it ranked, and contributions simply
  * sum across branches (Cormack/Clarke/Büttcher's RRF).
  *
  * Scale shape: fusion runs on CANDIDATE lists — each branch is already
  * a top-k (TakeOrdered) frame of ≤ k rows, so the per-branch
  * row_number window is a constant-sized single-partition sort, the
  * union is ≤ Σk rows, and the final aggregate is trivial. The
  * corpus-scale work lives entirely inside the branches (posting-list
  * pruned BM25, cell-pruned IVF); fusion adds no data-sized stage at
  * any corpus size.
  *
  * Exactness: per-branch contributions round to integer micro-units
  * (round(1e6/(k0+rank)) — the BM25 contribution recipe), so the
  * cross-branch sum is order-independent and engine-exact.
  */
object Fusion {

  /** The standard RRF dampening constant. */
  val K0 = 60

  /** Attach a dense 1-based `rank` to a candidate frame under `order`
    * (the caller's ordering MUST break ties deterministically).
    * Candidate-sized input only — see the scale note above.
    */
  def ranked(cands: DataFrame, idCol: String, order: Seq[Column]): DataFrame =
    cands.select(col(idCol).as("doc_id"),
      row_number().over(Window.orderBy(order: _*)).as("rank"))

  /** Fuse [[ranked]] branches: (doc_id, n_branches, rrf) where
    * rrf = Σ_branches round(1e6/(k0+rank))/1e6.
    */
  def rrf(branches: Seq[DataFrame], k0: Int = K0): DataFrame =
    branches.map(b => b.select(col("doc_id"),
        round(lit(1e6) / (lit(k0) + col("rank")), 0).cast("long").as("_c")))
      .reduce(_ unionByName _)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_branches"),
        (sum(col("_c")).cast("double") / lit(1e6)).as("rrf"))
}
