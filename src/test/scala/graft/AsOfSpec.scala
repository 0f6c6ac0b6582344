package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** As-of join semantics on hand-computed cases: latest-at-or-before
  * matching, per-key isolation, tie handling, and the no-match null.
  */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 5L, "l0"),
    (2L, 10L, "m1")).toDF("k", "ts", "lv")

  private def right = Seq(
    (1L, 8L, "r8"), (1L, 15L, "r15"), (2L, 20L, "r20")).toDF("k", "ts", "rv")

  test("picks the latest right row at or before each left timestamp, per key") {
    val out = AsOf.asofJoin(left, right, "k", "ts")
      .select("k", "ts", "lv", "rv_r")
      .as[(Long, Long, String, Option[String])].collect().toSet
    assert(out === Set(
      (1L, 5L, "l0", None),        // nothing at or before ts=5
      (1L, 10L, "l1", Some("r8")),
      (1L, 20L, "l2", Some("r15")),
      (2L, 10L, "m1", None)))      // key 2's only right row is later
  }

  test("equal timestamps match (at-or-before includes ties)") {
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "lv")
    val r = Seq((1L, 10L, "same")).toDF("k", "ts", "rv")
    val out = AsOf.asofJoin(l, r, "k", "ts")
      .select("rv_r").as[Option[String]].head()
    assert(out === Some("same"))
  }

  test("rangeJoin buckets values into inclusive bands") {
    val fact = Seq(1.0, 5.0, 10.0, 25.0).toDF("v")
    val ranges = Seq(("a", 0.0, 9.0), ("b", 9.5, 30.0)).toDF("band", "lo", "hi")
    val out = AsOf.rangeJoin(fact, ranges, "v", "lo", "hi")
      .select("v", "band").as[(Double, String)].collect().toSet
    assert(out === Set((1.0, "a"), (5.0, "a"), (10.0, "b"), (25.0, "b")))
  }
}
