package graft

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join matches latest right row at or before left time") {
    val left = Seq(
      (1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 35L, "l3"),
      (2L, 15L, "l4"), (3L, 5L, "l5"))
      .toDF("k", "t", "lval")
    val right = Seq(
      (1L, 10L, "r@10"), (1L, 30L, "r@30"),
      (2L, 20L, "r@20")) // key 2's right row is AFTER the left row; key 3 has none
      .toDF("k", "rt", "rval")

    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt")
      .select($"lval", $"rt", $"rval")
      .as[(String, Option[Long], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(got("l1") == ((Some(10L), Some("r@10")))) // tie: inclusive <=
    assert(got("l2") == ((Some(10L), Some("r@10"))))
    assert(got("l3") == ((Some(30L), Some("r@30"))))
    assert(got("l4") == ((None, None)))              // right row is in the future
    assert(got("l5") == ((None, None)))              // no right rows for key
  }
}
