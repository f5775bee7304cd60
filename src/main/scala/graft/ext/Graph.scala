package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as keyed aggregations — the PageRank
  * companion of `Dedup.connectedComponents`. Each iteration is one
  * edge-keyed join + one destination-keyed aggregate; per-iteration
  * driver traffic is ZERO (the dangling-mass total rides as a 1-row
  * broadcast inside the plan, never collected).
  *
  * Exactness contract (the engine's portable-iteration recipe): ranks
  * live in integer PICO-units (1e12 = total mass), every step is
  * integer arithmetic — floor division for out-degree splits, damping
  * as ×85 `div` 100 — so reductions are order-independent, results are
  * partition-count-invariant, and the DuckDB oracle replays the chain
  * bit-exactly with `//`. Floors shed sub-pico mass instead of
  * renormalizing (a deterministic algorithm definition, identical on
  * both engines).
  *
  * Scale shape: state is one (node, rank) row per node; edges are
  * scanned once per iteration; a hot destination (page with millions of
  * in-links) is one reducer key with map-side partial sums — never one
  * task's pairwise problem. The node-sized per-iteration frame is
  * localCheckpointed (allowed by the SURVEY §8 rule: node-sized, not
  * edge- or token-stream-sized), keeping plan depth flat in iters.
  */
object Graph {
  val Scale = 1000000000000L // 1e12 pico-units of total rank mass
  val DampNum = 85L          // damping 0.85 as an exact integer ratio
  val DampDen = 100L

  /** PageRank after `iters` synchronous iterations over a directed edge
    * list. Returns (node, rank_pico) — exact integers.
    *
    * teleport = (Scale·15/100)/N; dangling mass is redistributed
    * uniformly (D/N to every node, floor) before damping, the standard
    * stochastic-matrix completion.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint(false)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("du"))
    // broadcast single-row node count: every per-node constant below is
    // a projection against it (no collect, no literal baked at driver)
    val nn = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), expr(s"${Scale}L div n").as("r"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val insum = e.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), expr("r div du").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("insum"))
      val dangling = ranks.join(outdeg.withColumnRenamed("src", "node"),
          Seq("node"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      ranks = nodes
        .join(insum, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(nn))
        .select(col("node"),
          (expr(s"((${Scale}L * 15L) div ${DampDen}L) div n") +
            expr(s"((coalesce(insum, 0L) + dang div n) * ${DampNum}L) div ${DampDen}L"))
            .as("r"))
        .localCheckpoint(false)
    }
    ranks.select(col("node"), col("r").as("rank_pico"))
  }
}
