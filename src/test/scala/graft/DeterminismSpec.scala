package graft

/** Catalog-wide partition-count invariance: every driver-contract query
  * must produce IDENTICAL rows when the shuffle partitioning changes —
  * the property that makes results reproducible across cluster sizes.
  * Sensitive shapes this hunts: floating-point aggregation order (sums
  * reduced in partition order), rank ties broken by physical row order,
  * limits/top-k without a total order, collect_list without a sort.
  *
  * Whole-catalog and executed (not plan-level): both runs collect at
  * sf0.001 under 32 vs 5 shuffle partitions.
  */
class DeterminismSpec extends SparkSpec {

  test("catalog results are shuffle-partition-count invariant") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    def runAll(parts: String): Map[String, Seq[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try names.map { n =>
        val rows =
          try SparkEntry.queries(n)(spark, sf0001)
            .collect().map(_.toString).sorted.toSeq
          catch { case e: Throwable => Seq(s"ERROR ${e.getClass.getName}") }
        n -> rows
      }.toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    val at32 = runAll("32")
    val at5 = runAll("5")
    val diff = names.filter(n => at32(n) != at5(n))
    diff.foreach { n =>
      val (a, b) = (at32(n), at5(n))
      val firstDiff = a.zipAll(b, "<missing>", "<missing>")
        .find { case (x, y) => x != y }
      println(s"[determinism] $n rows ${a.length} vs ${b.length}; " +
        s"first diff: ${firstDiff.map { case (x, y) => s"$x  <>  $y" }.getOrElse("")}")
    }
    assert(diff.isEmpty,
      s"partition-count-sensitive queries: ${diff.mkString(", ")}")
    // most of the catalog is non-empty at sf0.001 (a handful of pair
    // queries legitimately find no matches at the tiny SF), and no
    // query may ERROR under either partitioning
    assert(names.count(n => at32(n).nonEmpty) > names.size * 3 / 4)
    val errored = names.filter(n => at32(n).headOption.exists(_.startsWith("ERROR")))
    assert(errored.isEmpty, s"errored: ${errored.mkString(", ")}")
  }
}
