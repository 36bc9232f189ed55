package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val left = Seq(
    (1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 5L, "l5"), (2L, 10L, "l2_10"))
    .toDF("k", "t", "lv")
  private val right = Seq(
    (1L, 8L, "r8"), (1L, 10L, "r10"), (1L, 15L, "r15"), (3L, 1L, "r_other"))
    .toDF("k", "t", "rv")

  test("backward: latest right at-or-before, inclusive, null when none") {
    val got = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("t", "rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getString(4))))).toMap
    assert(got((1L, 10L)) == Some((10L, "r10")))  // equal time matches
    assert(got((1L, 20L)) == Some((15L, "r15")))
    assert(got((1L, 5L)) == None)                 // nothing at-or-before
    assert(got((2L, 10L)) == None)                // key absent on right
  }

  test("forward: earliest right at-or-after, inclusive") {
    val got = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("t", "rv"),
        forward = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got((1L, 10L)) == Some(10L))
    assert(got((1L, 5L)) == Some(8L))
    assert(got((1L, 20L)) == None)                // nothing at-or-after
  }

  test("plan: one key shuffle, no join operator, no pair expansion") {
    val plan = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("t", "rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one key shuffle:\n$plan")
  }

  test("left row count is preserved (exactly one output row per left row)") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.where(col("event_type") === "view")
      .select("user_id", "ts", "event_id")
    val out = AsofJoin.asof(purchases, views, Seq("user_id"), "ts", "ts",
      Seq("ts", "event_id"))
    assert(out.count() == purchases.count())
    // and every matched ts is <= the left ts
    assert(out.where(col("matched_ts") > col("ts")).count() == 0)
  }
}
