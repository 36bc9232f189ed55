package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{count => cnt, _}

/** Edge semantics of the two-pass rankers (`ops.Rank`) against the window
  * forms they document themselves row-identical to — the cases a round-10
  * review found diverging: NULL group keys (dropped by the old
  * null-rejecting offsets join), NULL values (NPE in the running-sum
  * accumulator; position shift in discPercentiles), BinaryType group keys
  * (reference-equality in the per-partition key comparison collapsed local
  * ranks), and silent overwrite of same-named input columns. */
class RankEdgeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("groupRanks: NULL group keys rank like any other group (window parity)") {
    val df = Seq(
      (Some("a"), 3, 1L), (Some("a"), 1, 2L), (None, 2, 3L),
      (None, 5, 4L), (Some("b"), 4, 5L), (None, 1, 6L))
      .toDF("g", "v", "id")
    val got = ops.Rank.groupRanks(df, Seq("g"), Seq(col("v"), col("id")))
      .select("id", "rank", "n").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", cnt(lit(1)).over(Window.partitionBy("g")).cast("long"))
      .select("id", "rank", "n").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"null-group ranks diverge: $got vs $want")
    assert(got.size == 6, "rows with a NULL group key were dropped")
  }

  test("groupRanks: BinaryType group keys use value equality (window parity)") {
    // every Array[Byte] is a fresh instance; reference-equality key
    // comparison would restart the local rank at every row
    val df = Seq(
      (Array[Byte](1, 2), 10, 1L), (Array[Byte](1, 2), 5, 2L),
      (Array[Byte](3), 7, 3L), (Array[Byte](1, 2), 8, 4L))
      .toDF("g", "v", "id")
    val got = ops.Rank.groupRanks(df, Seq("g"), Seq(col("v"), col("id")))
      .select("id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .select("id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"binary-group ranks diverge: $got vs $want")
  }

  test("groupRunningSums: NULL values contribute nothing (window parity)") {
    // includes an all-NULL group, whose partition sum must cumulate as 0
    // rather than poisoning later offsets
    val df = Seq(
      ("a", 1L, Some(10L)), ("a", 2L, None), ("a", 3L, Some(5L)),
      ("nulls", 4L, None), ("nulls", 5L, None),
      ("b", 6L, Some(7L)))
      .toDF("g", "id", "v")
    val got = ops.Rank.groupRunningSums(df, Seq("g"), Seq(col("id")), "v")
      .select("id", "running").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("running", coalesce(sum("v").over(w), lit(0L)))
      .select("id", "running").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"null-value running sums diverge: $got vs $want")
  }

  test("discPercentiles ignores NULL values like percentile_disc") {
    val df = Seq(
      ("a", Some(1)), ("a", None), ("a", Some(2)), ("a", Some(3)),
      ("b", Some(5)), ("b", None))
      .toDF("g", "v")
    val got = ops.Rank
      .discPercentiles(df, Seq("g"), "v", Seq((1, 2)), Seq("p50"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val want = df.groupBy("g")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
        .cast("int").as("p50"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == want, s"null-value percentiles diverge: $got vs $want")
  }

  test("reserved/output column names in the input fail loudly") {
    val clash = Seq(("a", 1, 2L)).toDF("g", "v", "rank")
    val e = intercept[IllegalArgumentException] {
      ops.Rank.groupRanks(clash, Seq("g"), Seq(col("v")))
    }
    assert(e.getMessage.contains("rank"))
    val clash2 = Seq(("a", 1L, 2L)).toDF("g", "running", "v")
    intercept[IllegalArgumentException] {
      ops.Rank.groupRunningSums(clash2, Seq("g"), Seq(col("v")), "v")
    }
  }
}
