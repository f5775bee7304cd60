package graft

import graft.queries.WarehouseQueries

/** Next-fit-decreasing compaction planner: the relational prefix-sum
  * spelling vs an imperative replay, the straddle-bounded capacity
  * invariant, and the corpus-derived manifest bound.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def plan(sf: String) =
    WarehouseQueries.queries("compaction_plan")(spark, sf)
      .as[(Long, Long, Long)].collect() // (file_id, size_chars, bin)

  test("compaction_plan equals the imperative NFD boundary-pack replay") {
    val got = plan(sf0001).map(r => r._1 -> (r._2, r._3)).toMap
    val files = got.toSeq.map { case (fid, (sz, _)) => (fid, sz) }
    val cap = (files.map(_._2).sum / files.size) *
      WarehouseQueries.CompactionCapFactor
    var ps = 0L
    val expect = scala.collection.mutable.Map[Long, Long]()
    files.sortBy { case (fid, sz) => (-sz, fid) }.foreach { case (fid, sz) =>
      expect(fid) = ps / cap + 1; ps += sz
    }
    assert(got.nonEmpty)
    got.foreach { case (fid, (_, bin)) => assert(bin == expect(fid), s"file $fid") }
  }

  test("bins respect the capacity up to the final straddling file") {
    val rows = plan(sf0001)
    val cap = (rows.map(_._2).sum / rows.size) *
      WarehouseQueries.CompactionCapFactor
    // In size-desc packing order, a bin's LAST file is the only one that
    // may straddle the capacity boundary: load minus it stays under cap.
    rows.sortBy(r => (-r._2, r._1)).groupBy(_._3).foreach { case (bin, fs) =>
      val load = fs.map(_._2).sum
      val last = fs.last._2
      assert(load - last < cap, s"bin $bin overfilled beyond the straddle")
    }
    // packing actually compacts: fewer bins than files
    assert(rows.map(_._3).distinct.length < rows.length)
  }

  test("manifest stays ~targetFiles rows as the corpus grows") {
    // 500 docs at sf0.001 vs 5000 at sf0.1: the derived granularity must
    // keep the planner's input pinned near CompactionTargetFiles rather
    // than growing 10x with the corpus.
    val small = plan(sf0001).length
    val large = plan("/root/testdata/sf0.1").length
    assert(small <= WarehouseQueries.CompactionTargetFiles + 1)
    assert(large <= WarehouseQueries.CompactionTargetFiles + 1)
  }
}
