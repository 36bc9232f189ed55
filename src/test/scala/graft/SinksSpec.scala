package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  import TestSpark.spark

  test("TSV sink + MR-output key reader roundtrip (S3/S4)") {
    val out = "/tmp/graft_sinks_spec_tsv"
    val totals = ops.Parity.categoryTotals(Tables.events(spark, TestSpark.sf0001))
    Sinks.writeTsv(totals, out, coalesce = 1)
    val keys = Sinks.readTsvKeys(spark, out).collect().map(_.getString(0)).toSeq
    val want = totals.select("event_type").collect().map(_.getString(0)).sorted.toSeq
    assert(keys == want)
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val d = TestSpark.sf0001
    Sinks.writeBucketed(Tables.orders(spark, d), "b_orders", "o_orderkey", 8,
      sortColumn = Some("o_orderkey"))
    Sinks.writeBucketed(Tables.lineitem(spark, d), "b_lineitem", "l_orderkey", 8,
      sortColumn = Some("l_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucket co-location: the JOIN inputs read pre-partitioned files; the
      // only exchange allowed is the one for the final small groupBy
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"join should be shuffle-free over bucketed tables:\n$joinSection")
      assert(joined.collect().map(_.getLong(1)).sum == Tables.lineitem(spark, d).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
