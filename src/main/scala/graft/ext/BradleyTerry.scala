package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley-Terry strength fitting from pairwise match outcomes, via
  * minorization-maximization (Hunter, "MM algorithms for generalized
  * Bradley-Terry models", Annals of Statistics 2004) in integer
  * micro-units so the fit replays EXACTLY in any engine.
  *
  * Per round, for each player i:
  *   D_i  = Σ_j n_ij·1e12 div (s_i + s_j)        (pairwise integer div)
  *   raw_i = clamp₁..₁ₑ₁₀(W_i·1e12 div D_i)
  *   s_i  = clamp₁..₁ₑ₉(raw_i·1e6 div raw_anchor)  (anchor = lexicographically
  *                                                  first player, pinned at 1e6)
  * The clamps bound every product inside int64 and are inert on any
  * non-degenerate match matrix; a zero-win player floors at rating 1.
  *
  * Scale shape: each round is one keyed join+agg over the match matrix
  * (|players|² upper bound, usually far sparser) — player-count-sized
  * state, never corpus-sized. The corpus-scale work is whatever produced
  * the matches. `localCheckpoint` per round cuts the lazy-chain blowup
  * (the PageRank lesson: an uncheckpointed iterative chain re-executes
  * its prefix multiplicatively).
  */
object BradleyTerry {

  /** @param matches one row per decided match, columns `aCol` < `bCol`
    *                (player ids) and `winCol` (equal to one of them)
    * @return (player, wins, n_matches, bt_micro) — `bt_micro` is the
    *         anchored strength in micro-units
    */
  def fit(matches: DataFrame, aCol: String, bCol: String, winCol: String,
      iters: Int): DataFrame = {
    val m = matches.select(col(aCol).as("sa"), col(bCol).as("sb"),
      col(winCol).as("winner")).localCheckpoint(false)
    val roster = m.select(col("sa").as("player"))
      .unionAll(m.select(col("sb").as("player"))).distinct()
    val played = m.select(col("sa").as("player"), col("sb").as("opp"))
      .unionAll(m.select(col("sb").as("player"), col("sa").as("opp")))
    val nij = played.groupBy(col("player"), col("opp"))
      .agg(count(lit(1)).as("nm")).localCheckpoint(false)
    val wins = m.groupBy(col("winner").as("player"))
      .agg(count(lit(1)).as("w")).localCheckpoint(false)

    var rating = roster.select(col("player"), lit(1000000L).as("r"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      // every side here is player-count-sized (constant vs corpus) and
      // post-checkpoint/post-agg (statless for AQE) — broadcast by design
      val sj = rating.select(col("player").as("opp"), col("r").as("rj"))
      val den = nij.join(broadcast(rating), Seq("player"))
        .join(broadcast(sj), Seq("opp"))
        .groupBy(col("player"))
        .agg(sum(expr("nm * 1000000000000 div (r + rj)")).as("den"))
      val raw = rating.join(broadcast(den), Seq("player"), "left")
        .join(broadcast(wins), Seq("player"), "left")
        .select(col("player"),
          greatest(lit(1L),
            when(col("den").isNull || col("den") === 0, col("r"))
              .otherwise(least(
                expr("coalesce(w, 0) * 1000000000000 div den"),
                lit(10000000000L)))).as("r0"))
      val an = raw.agg(min_by(col("r0"), col("player")).as("anch"))
      rating = raw.crossJoin(broadcast(an))
        .select(col("player"),
          greatest(lit(1L), least(expr("r0 * 1000000 div anch"),
            lit(1000000000L))).as("r"))
        .localCheckpoint(false)
    }
    val totals = nij.groupBy(col("player")).agg(sum(col("nm")).as("n_matches"))
    rating.join(broadcast(wins), Seq("player"), "left")
      .join(broadcast(totals), Seq("player"), "left")
      .select(col("player"), coalesce(col("w"), lit(0L)).as("wins"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("r").as("bt_micro"))
  }
}
