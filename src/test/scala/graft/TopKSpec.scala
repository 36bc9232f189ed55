package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Relational, TopK}

/** The custom heap-based top-k operator must agree row-for-row with the
  * window formulation, and its physical plan must contain the custom exec
  * with NO window/sort doing the ranking. */
class TopKSpec extends AnyFunSuite {
  import TestSpark.spark

  test("heap top-k == window row_number top-k on real data") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val viaWindow = Relational.topOrdersPerCustomer(orders, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val viaHeap = TopK.perKey(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        keys = Seq("o_custkey"),
        orderSpec = Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(viaHeap == viaWindow)
  }

  test("physical plan uses TopKPerKeyExec with no Window operator") {
    val ranked = TopK.perKey(
      Tables.orders(spark, TestSpark.sf0001)
        .select("o_custkey", "o_orderkey", "o_totalprice"),
      keys = Seq("o_custkey"),
      orderSpec = Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    val plan = org.apache.spark.sql.GraftBridge
      .analyzedPlan(ranked).toString + "\n" +
      ranked.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!ranked.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("handles groups smaller than k and unknown columns fail cleanly") {
    import spark.implicits._
    val tiny = Seq((1L, 10L, 5.0), (1L, 11L, 7.0), (2L, 20L, 1.0))
      .toDF("k", "id", "v")
    val got = TopK.perKey(tiny, Seq("k"), Seq(("v", true), ("id", false)), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == Set((1L, 11L, 1), (1L, 10L, 2), (2L, 20L, 1)))
    val err = intercept[Exception] {
      TopK.perKey(tiny, Seq("nope"), Seq(("v", true)), k = 1).collect()
    }
    assert(err.getMessage.contains("nope"))
  }
}
