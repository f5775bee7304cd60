package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.queries.CorpusQueries

/** Winnowing (MOSS) fingerprint selection: the declarative packed-key
  * sliding-min spelling vs a brute-force per-window rightmost-min
  * reference, plus the algorithm's coverage guarantee.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = CorpusQueries.WinnowK
  private val W = CorpusQueries.WinnowW
  private val P = Dedup.MinhashP
  private val A = Dedup.ShingleA

  private def h32(tk: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(tk.getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Brute force: every window of W consecutive k-gram hashes selects its
    * rightmost minimum; distinct (1-based pos, hash) pairs.
    */
  private def reference(text: String): Set[(Long, Long)] = {
    val toks = text.toLowerCase.split("\\s+")
    val th = toks.map(h32)
    val kg: Array[Long] =
      if (th.length < K) th.map(h => ((h % P) + P) % P)
      else th.sliding(K).map(w =>
        w.tail.foldLeft(w.head)((a, b) => (a * A + b) % P)).toArray
    val l = kg.length
    val sel = scala.collection.mutable.Set[(Long, Long)]()
    for (q <- (math.min(W, l) - 1) until l) {
      val start = math.max(0, q - W + 1)
      var bi = start
      for (j <- start to q) if (kg(j) <= kg(bi)) bi = j
      sel += (((bi + 1).toLong, kg(bi)))
    }
    sel.toSet
  }

  test("winnowSelected equals the brute-force rightmost-min reference") {
    val got = CorpusQueries.winnowSelected(spark, sf0001)
      .select($"doc_id", $"fpos", $"fh").as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(r => (r._2, r._3)).toSet
      }
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(docs.nonEmpty && got.nonEmpty)
    docs.foreach { case (id, text) =>
      assert(got(id) == reference(text), s"doc $id")
    }
  }

  test("coverage guarantee: every W-window contains a selected position") {
    val sel = CorpusQueries.winnowSelected(spark, sf0001)
      .groupBy($"doc_id")
      .agg(sort_array(collect_list($"fpos")).as("ps"),
        max($"n_kgrams").as("l"))
      .as[(Long, Seq[Long], Long)].collect()
    assert(sel.nonEmpty)
    sel.filter(_._3 >= W).foreach { case (id, ps, l) =>
      assert(ps.head <= W, s"doc $id head")
      assert(ps.last >= l - W + 1, s"doc $id last")
      ps.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= W, s"doc $id gap $a->$b")
        case _ =>
      }
    }
  }
}
