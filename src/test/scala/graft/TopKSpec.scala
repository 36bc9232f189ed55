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

  test("optimizer rule rewrites the idiomatic window top-k into the heap operator") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val viaWindow = Relational.topOrdersPerCustomer(
      Tables.orders(spark, TestSpark.sf0001), 3)
    val plan = viaWindow.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"window top-k should auto-rewrite to the heap operator:\n$plan")
    // neither the Window exec nor Spark's sort-based WindowGroupLimit remains
    assert(!plan.contains("WindowGroupLimit"), s"redundant group limit:\n$plan")
    assert(!plan.contains("Window ["))
    // and results are still the reference row_number semantics
    val rows = viaWindow.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(3) <= 3))
  }

  test("partial heap pass prunes below the exchange (map-side top-k)") {
    val ranked = TopK.perKey(
      Tables.orders(spark, TestSpark.sf0001)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .repartition(8), // force a genuinely multi-partition child
      keys = Seq("o_custkey"),
      orderSpec = Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    val plan = ranked.queryExecution.executedPlan.toString
    val iFinal = plan.indexOf("TopKPerKeyFinal")
    val iExchange = plan.indexOf("Exchange hashpartitioning")
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    assert(iFinal >= 0 && iExchange >= 0 && iPartial >= 0,
      s"expected final + key exchange + partial in plan:\n$plan")
    // tree prints top-down: final ABOVE the key exchange, partial BELOW it
    assert(iFinal < iExchange && iExchange < iPartial,
      s"partial pass must run below the exchange:\n$plan")
    // ranks are still the global per-key row_number semantics
    val viaWindow = Relational.topOrdersPerCustomer(
      Tables.orders(spark, TestSpark.sf0001), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val got = ranked.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == viaWindow)
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
