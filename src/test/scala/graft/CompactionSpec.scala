package graft

import graft.queries.WarehouseQueries

/** FFD compaction planner: the declarative fold vs an imperative
  * first-fit-decreasing replay, plus the capacity invariant.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def plan(sf: String) =
    WarehouseQueries.queries("compaction_plan")(spark, sf)
      .as[(Long, Long, Long)].collect() // (file_id, size_chars, bin)

  test("compaction_plan equals the imperative FFD replay") {
    val got = plan(sf0001).map(r => r._1 -> (r._2, r._3)).toMap
    val files = got.toSeq.map { case (fid, (sz, _)) => (fid, sz) }
    val cap = (files.map(_._2).sum / files.size) *
      WarehouseQueries.CompactionCapFactor
    val loads = scala.collection.mutable.ArrayBuffer[Long]()
    val expect = scala.collection.mutable.Map[Long, Long]()
    files.sortBy { case (fid, sz) => (-sz, fid) }.foreach { case (fid, sz) =>
      val i = loads.indexWhere(_ + sz <= cap)
      if (i >= 0) { loads(i) += sz; expect(fid) = i + 1L }
      else { loads += sz; expect(fid) = loads.size.toLong }
    }
    assert(got.nonEmpty)
    got.foreach { case (fid, (_, bin)) => assert(bin == expect(fid), s"file $fid") }
  }

  test("no multi-file bin exceeds the capacity") {
    val rows = plan(sf0001)
    val cap = (rows.map(_._2).sum / rows.size) *
      WarehouseQueries.CompactionCapFactor
    rows.groupBy(_._3).foreach { case (bin, fs) =>
      if (fs.length > 1)
        assert(fs.map(_._2).sum <= cap, s"bin $bin overfilled")
    }
    // packing actually compacts: fewer bins than files
    assert(rows.map(_._3).distinct.length < rows.length)
  }
}
