package graft

import org.apache.spark.sql.functions._

import graft.ext.Graph

/** Integer-exact PageRank (ext/Graph): hand-computed fixture including a
  * dangling node, mass accounting, and partition-count invariance.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 1 -> 2, 1 -> 3, 2 -> 3; node 3 dangles (no out-edges).
  private def triangle = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    .toDF("src", "dst")

  /** Driver-side replay of the documented integer algorithm. */
  private def replay(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val insum = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      val dang = nodes.filterNot(outdeg.contains).map(r).sum
      r = nodes.map { v =>
        v -> (((Graph.Scale * 15) / Graph.DampDen) / n +
          ((insum.getOrElse(v, 0L) + dang / n) * Graph.DampNum) / Graph.DampDen)
      }.toMap
    }
    r
  }

  test("pageRank matches the driver-side integer replay on a dangling-node graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    for (iters <- Seq(0, 1, 3)) {
      val got = Graph.pageRank(
          triangle.select($"src".cast("string").as("src"),
            $"dst".cast("string").as("dst")), "src", "dst", iters)
        .as[(String, Long)].collect().map { case (k, v) => (k.toLong, v) }
        .toMap
      assert(got == replay(edges, iters), s"iters=$iters")
    }
  }

  test("rank mass stays within floor-loss of the full scale and the sink dominates") {
    val r = Graph.pageRank(
        triangle.select($"src".cast("string").as("src"),
          $"dst".cast("string").as("dst")), "src", "dst", 5)
      .as[(String, Long)].collect().toMap
    val total = r.values.sum
    // floors only ever DROP sub-unit mass: total <= Scale, and with
    // ~iters*n floor sites the loss stays tiny
    assert(total <= Graph.Scale && total > (Graph.Scale * 999) / 1000)
    // node 3 receives from both 1 and 2 -> strictly highest rank
    assert(r("3") > r("2") && r("2") > r("1"))
  }

  test("pageRank is partition-count invariant") {
    val e = triangle.select($"src".cast("string").as("src"),
      $"dst".cast("string").as("dst"))
    val a = Graph.pageRank(e.repartition(1), "src", "dst", 3)
      .as[(String, Long)].collect().toMap
    val b = Graph.pageRank(e.repartition(7), "src", "dst", 3)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Option[Double]) = {
    val r = Graph.triangleCensus(edges.toDF("u", "v"), "u", "v")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(r.length == 1)
    r.head
  }

  test("triangleCensus on hand-built graphs") {
    // K4: 6 edges, 12 wedges, 4 triangles, clustering 1.0
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(census(k4) == ((6L, 12L, 4L, Some(1.0))))
    // 4-cycle: 4 edges, 4 wedges, no triangles
    assert(census(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) ==
      ((4L, 4L, 0L, Some(0.0))))
    // Star S5 (hub 0): wedges C(5,2)=10 at the hub, no triangles —
    // and under degree orientation the hub builds NO oriented wedges
    // (all its edges point into it).
    assert(census((1L to 5L).map(i => (0L, i))) == ((5L, 10L, 0L, Some(0.0))))
    // Hub + one closing edge: wedges 10 (hub) + 1 + 1, one triangle.
    val hub = (1L to 5L).map(i => (0L, i)) :+ (1L, 2L)
    assert(census(hub) == ((6L, 12L, 1L, Some(0.25))))
    // Edgeless-wedge graph (single edge): clustering is null, not NaN.
    assert(census(Seq((1L, 2L))) == ((1L, 0L, 0L, None)))
  }

  test("triangleCensus canonicalizes duplicates, mirrors, and self-loops") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L), (1L, 3L))
    assert(census(messy) == ((3L, 3L, 1L, Some(1.0))))
  }

  private def core(edges: Seq[(Long, Long)], q: Double, rounds: Int) =
    Graph.kCore(edges.toDF("u", "v"), "u", "v", q, rounds)
      .as[(Long, Long, Long)].collect().sorted.toSeq

  test("kCore peels a pendant but keeps the triangle") {
    // triangle a,b,c + pendant d on c. Degrees [1,2,2,3]: the exact
    // median is 2, so q=0.5 -> k=2; the 2-core is the triangle with
    // every within-core degree 2 (c loses the pendant edge).
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    assert(core(g, 0.5, 4) == Seq((1L, 2L, 2L), (2L, 2L, 2L), (3L, 2L, 2L)))
  }

  test("kCore cascades a chain peel across rounds") {
    // triangle 1,2,3 + path 3-4-5. Degrees [1,2,2,2,3] -> k=2 at the
    // median. Round 1 peels 5 (deg 1), round 2 peels 4 (deg dropped
    // to 1), round 3 confirms — a genuinely multi-round cascade.
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    assert(core(g, 0.5, 4) == Seq((1L, 2L, 2L), (2L, 2L, 2L), (3L, 2L, 2L)))
    // With only 1 round the cascade is TRUNCATED: node 4 survives the
    // first peel (its degree was still 2) — proving rounds matter.
    assert(core(g, 0.5, 1).map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  /** Driver-side replay of the documented LPA-with-self-vote rule. */
  private def lpaReplay(edges: Seq[(String, String)], iters: Int)
      : Map[String, String] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val adj = edges ++ nodes.map(v => (v, v)) // self-vote
    var lbl = nodes.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      lbl = adj.groupBy(_._1).view.mapValues { es =>
        es.map(e => lbl(e._2)).groupBy(identity).view.mapValues(_.size)
          .toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lbl
  }

  private def lpaRun(edges: Seq[(String, String)], iters: Int) = {
    val sym = edges ++ edges.map(_.swap)
    Graph.lpa(sym.toDF("src", "dst"), "src", "dst", iters)
      .as[(String, String)].collect().toMap
  }

  test("lpa matches the driver replay and separates two bridged triangles") {
    // two triangles joined by one bridge edge c3-d1
    val g = Seq(("c1", "c2"), ("c2", "c3"), ("c1", "c3"),
      ("d1", "d2"), ("d2", "d3"), ("d1", "d3"), ("c3", "d1"))
    val sym = g ++ g.map(_.swap)
    for (iters <- Seq(0, 1, 4)) {
      val expect = lpaReplay(sym, iters)
      assert(lpaRun(g, iters) == expect, s"iters=$iters")
    }
    val fin = lpaRun(g, 4)
    // each triangle coheres on its own min label; the bridge does not
    // merge them (d1's neighborhood majority is its own triangle)
    assert(fin("c1") == fin("c2") && fin("c2") == fin("c3"))
    assert(fin("d1") == fin("d2") && fin("d2") == fin("d3"))
    assert(fin("c1") != fin("d1"))
    // fixpoint within the catalog budget on the hand graph
    assert(lpaRun(g, graft.queries.GraphQueries.LpaIters) ==
      lpaRun(g, graft.queries.GraphQueries.LpaIters + 1))
  }

  test("lpa distinctEdges round-1 closed form equals the general vote plan") {
    // r13: with no duplicate (src, dst) rows, round 1's vote counts are
    // all 1 and the argmin degenerates to min(dst ∪ self) — prove the
    // fast path equals the general plan round for round on a hand graph
    // (incl. the bridged-triangle one whose labels keep moving).
    val g = Seq(("c1", "c2"), ("c2", "c3"), ("c1", "c3"),
      ("d1", "d2"), ("d2", "d3"), ("d1", "d3"), ("c3", "d1"))
    val sym = (g ++ g.map(_.swap)).toDF("src", "dst")
    for (iters <- Seq(0, 1, 2, 4)) {
      val slow = Graph.lpa(sym, "src", "dst", iters)
        .as[(String, String)].collect().sorted.toSeq
      val fast = Graph.lpa(sym, "src", "dst", iters, distinctEdges = true)
        .as[(String, String)].collect().sorted.toSeq
      assert(fast == slow, s"iters=$iters")
    }
  }

  test("lpa is deterministic on the bipartite fixture graph and labels every node") {
    import graft.queries.GraphQueries.LpaIters
    val orders = Tables.orders(spark, sf0001)
    val li = Tables.lineitem(spark, sf0001)
    val base = orders.join(li, $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("c"),
        concat(lit("s"), $"l_suppkey").as("sp")).distinct()
    val sym = base.select($"c".as("src"), $"sp".as("dst"))
      .unionAll(base.select($"sp".as("src"), $"c".as("dst")))
    val n = sym.select($"src").distinct().count()
    val out = Graph.lpa(sym, "src", "dst", LpaIters)
      .as[(String, String)].collect()
    assert(out.length == n && out.map(_._1).distinct.length == n)
    val again = Graph.lpa(sym.repartition(7), "src", "dst", LpaIters)
      .as[(String, String)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("harmonicCloseness on a hand path graph: exact micro sums, depth cap, disconnection") {
    import spark.implicits._
    // path a-b-c-d-e plus a disconnected pair f-g, symmetrized
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("f", "g"))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    def run(srcNodes: Seq[String], depth: Int) =
      Graph.harmonicCloseness(e, "src", "dst",
        srcNodes.toDF("node"), "node", depth)
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // full depth: a sees b=1,c=2,d=3,e=4; c sees two at 1, two at 2;
    // f sees only g — unreachable nodes simply don't contribute
    // (harmonic is disconnection-safe by construction)
    assert(run(Seq("a", "c", "f"), depth = 6) == Seq(
      ("a", 4L, 1000000L + 500000L + 333333L + 250000L),
      ("c", 4L, 2L * 1000000L + 2L * 500000L),
      ("f", 1L, 1000000L)))
    // depth cap truncates the horizon, it does not error
    assert(run(Seq("a"), depth = 2) == Seq(("a", 2L, 1500000L)))
  }

  test("harmonicCloseness bitset walk equals the pair-spelling walk") {
    import spark.implicits._
    // r13 round 2: ≤64 sources run bit-packed (one long mask per node,
    // bit_or per round) — prove it equals the general (source, node)
    // pair BFS on a hand graph at several depths and on the fixture
    // trade graph with the catalog's own md5-ranked 16-source sample.
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("f", "g"))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    for (depth <- Seq(1, 2, 6); srcs <- Seq(Seq("a"), Seq("a", "c", "f"))) {
      val s = srcs.toDF("node")
      val fast = Graph.harmonicCloseness(e, "src", "dst", s, "node", depth)
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      val slow = Graph.harmonicClosenessPairs(e, "src", "dst", s, "node", depth)
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(fast == slow, s"depth=$depth srcs=$srcs")
    }
    // fixture trade graph, catalog sample shape (16 sources, depth 6)
    val orders = Tables.orders(spark, sf0001)
    val li = Tables.lineitem(spark, sf0001)
    val base = orders.join(li, $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("c"),
        concat(lit("s"), $"l_suppkey").as("sp")).distinct()
    val sym = base.select($"c".as("src"), $"sp".as("dst"))
      .unionAll(base.select($"sp".as("src"), $"c".as("dst")))
    val srcs = sym.select($"src".as("node")).distinct()
      .orderBy(md5($"node"), $"node").limit(16)
    val fast = Graph.harmonicCloseness(sym, "src", "dst", srcs, "node", 6)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val slow = Graph.harmonicClosenessPairs(sym, "src", "dst", srcs, "node", 6)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(fast.nonEmpty && fast == slow)
  }

  test("assortativity degree-moment spelling equals the naive two-join spelling") {
    // The catalog query computes Newman assortativity from node-sized
    // degree moments plus ONE degree-attach join (see GraphQueries);
    // this replays the textbook spelling — deg joined onto BOTH edge
    // endpoints, sums over the denormalized edge scan — and asserts the
    // full (m, sxy, assortativity) row is identical. Integer sufficient
    // statistics make the equality exact, not approximate.
    val orders = Tables.orders(spark, sf0001)
    val li = Tables.lineitem(spark, sf0001)
    val lab = orders.join(li, $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("c"),
        concat(lit("s"), $"l_suppkey").as("sp")).distinct()
    val sym = lab.select($"c".as("src"), $"sp".as("dst"))
      .unionAll(lab.select($"sp".as("src"), $"c".as("dst")))
    val deg = sym.groupBy($"src").agg(count(lit(1)).as("dg"))
    val naive = sym
      .join(deg.select($"src", $"dg".as("dx")), "src")
      .join(deg.select($"src".as("dst"), $"dg".as("dy")), "dst")
      .agg(count(lit(1)).as("m"),
        sum($"dx").as("sx"), sum($"dy").as("sy"),
        sum($"dx" * $"dy").as("sxy"),
        sum($"dx" * $"dx").as("sxx"),
        sum($"dy" * $"dy").as("syy"))
      .select($"m", $"sxy",
        expr("""round((cast(m as double) * sxy - cast(sx as double) * sy) /
               | nullif(
               |  sqrt(cast(m as double) * sxx - cast(sx as double) * sx)
               |  * sqrt(cast(m as double) * syy - cast(sy as double) * sy),
               | 0.0), 6)""".stripMargin).as("assortativity"))
      .as[(Long, Long, Option[Double])].collect().toSeq
    val moment = graft.queries.GraphQueries.queries("graph_assortativity")(
      spark, sf0001).as[(Long, Long, Option[Double])].collect().toSeq
    assert(naive.size == 1 && moment == naive)
    assert(naive.head._1 > 0L)
  }

  test("kCore reaches its fixpoint on the fixture within the catalog's round budget") {
    import graft.queries.GraphQueries.{KCoreQuantile, KCoreRounds}
    val orders = Tables.orders(spark, sf0001)
    val li = Tables.lineitem(spark, sf0001)
    val base = orders.join(li, $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("src"),
        concat(lit("s"), $"l_suppkey").as("dst")).distinct()
    def run(r: Int) = Graph.kCore(base, "src", "dst", KCoreQuantile, r)
      .as[(String, Long, Long)].collect().sorted.toSeq
    val atBudget = run(KCoreRounds)
    assert(atBudget.nonEmpty)
    assert(atBudget == run(KCoreRounds + 1),
      "peel had not converged within KCoreRounds — raise the budget")
  }
}
