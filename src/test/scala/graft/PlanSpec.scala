package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops._

/** Plan-shape regression guards: the optimizations the engine's 100 TB
  * posture depends on, asserted against the actual physical plans so a
  * refactor cannot silently lose them (SURVEY §4.2). */
class PlanSpec extends AnyFunSuite {
  import TestSpark.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: filter and projection push into the parquet scan") {
    val p = Relational.pricingSummary(Tables.lineitem(spark, TestSpark.sf0001))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // pruned read schema: no orderkey/partkey/suppkey columns reach the scan
    assert(!p.contains("l_partkey"))
  }

  test("q3: dimension side broadcasts; top-10 is TakeOrderedAndProject, not global sort") {
    val p = plan(Relational.topUrgentOrders(
      Tables.customer(spark, TestSpark.sf0001),
      Tables.orders(spark, TestSpark.sf0001),
      Tables.lineitem(spark, TestSpark.sf0001)))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("star fact: dims broadcast, exactly one hash-partition shuffle for the cube") {
    val p = plan(Star.fact(Tables.orders(spark, TestSpark.sf0001),
      Tables.customer(spark, TestSpark.sf0001), Tables.nation(spark, TestSpark.sf0001)))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // the fact source aggregates through ONE hashpartitioning exchange on
    // (d, category, district); dim builds shuffle only their tiny distincts
    val factShuffles = "Exchange hashpartitioning\\(d#\\d+, category#".r
      .findAllIn(p).size
    assert(factShuffles == 1, s"fact build should shuffle once:\n$p")
  }

  test("aggregations run as partial+final HashAggregate pairs") {
    val p = plan(Parity.categoryTotals(Tables.events(spark, TestSpark.sf0001)))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("partial_count") || p.contains("merge_count")
      || "HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("partitioned parquet write enables partition pruning on read") {
    val out = "/tmp/graft_partitioned_events"
    val ev = Tables.events(spark, TestSpark.sf0001)
      .withColumn("day", to_date(col("ts")))
    graft.sources.Sinks.writeParquet(ev, out, partitionBy = Seq("day"))
    val pruned = spark.read.parquet(out).where(col("day") === "2024-01-05")
    val p = plan(pruned)
    assert(p.contains("PartitionFilters: [isnotnull(day"))
    assert(pruned.count() > 0)
    // prune actually reduced the files read: full scan reads 30 partitions
    val full = spark.read.parquet(out).count()
    assert(pruned.count() < full)
  }
}
