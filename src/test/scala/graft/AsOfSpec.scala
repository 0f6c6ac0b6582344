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

  test("a matched right row with a NULL payload yields NULL, not an older value") {
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "lv")
    val r = Seq((1L, 3L, Some("old")), (1L, 8L, None)).toDF("k", "ts", "rv")
    // the latest right row at-or-before ts=10 is (ts=8, rv=NULL): its null
    // must NOT be skipped in favor of (ts=3, "old")
    val out = AsOf.asofJoin(l, r, "k", "ts")
      .select("rv_r").as[Option[String]].head()
    assert(out === None)
  }

  test("NULL keys never match (SQL join semantics)") {
    val l = Seq((Option.empty[Long], 10L, "x"), (Some(1L), 10L, "y"))
      .toDF("k", "ts", "lv")
    val r = Seq((Option.empty[Long], 5L, "r0"), (Some(1L), 5L, "r1"))
      .toDF("k", "ts", "rv")
    val out = AsOf.asofJoin(l, r, "k", "ts")
      .select("lv", "rv_r").as[(String, Option[String])].collect().toMap
    assert(out("x") === None)       // null-key left row matches nothing
    assert(out("y") === Some("r1"))
  }

  test("NULL timestamps never match (no timestamp -infinity leak)") {
    // A null-ts right row would sort first (Spark nulls-first under asc)
    // and leak its payload to every left row; DuckDB ASOF (l.ts >= r.ts)
    // never matches NULL. A null-ts left row matches nothing.
    val l = Seq((1L, Some(10L), "x"), (1L, Option.empty[Long], "nl"))
      .toDF("k", "ts", "lv")
    val r = Seq((1L, Option.empty[Long], "leak"), (1L, Some(5L), "ok"))
      .toDF("k", "ts", "rv")
    val out = AsOf.asofJoin(l, r, "k", "ts")
      .select("lv", "rv_r").as[(String, Option[String])].collect().toMap
    assert(out("x") === Some("ok"))   // not "leak"
    assert(out("nl") === None)        // null left ts matches nothing
  }

  test("rangeJoin buckets values into inclusive bands") {
    val fact = Seq(1.0, 5.0, 10.0, 25.0).toDF("v")
    val ranges = Seq(("a", 0.0, 9.0), ("b", 9.5, 30.0)).toDF("band", "lo", "hi")
    val out = AsOf.rangeJoin(fact, ranges, "v", "lo", "hi")
      .select("v", "band").as[(Double, String)].collect().toSet
    assert(out === Set((1.0, "a"), (5.0, "a"), (10.0, "b"), (25.0, "b")))
  }
}
