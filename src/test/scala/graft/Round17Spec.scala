package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 regressions: (1) the keep-when-LIMIT/OFFSET/FETCH-follows
  * check of stripTrailingOrderBy must scan a comment-and-literal-blanked
  * view of the tail — "ORDER BY a -- limit removed" must not retain the
  * no-op sort the function exists to prune; (2) the two previously
  * spec-only components (Sinks.writeBucketed, Streaming.jdbcAppendSink)
  * now carry driver-gate queries whose end states must equal the batch
  * answers they are oracled against. */
class Round17Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("stripTrailingOrderBy: LIMIT/FETCH inside a trailing comment does not keep the no-op sort") {
    assert(Verify.stripTrailingOrderBy("SELECT a FROM t ORDER BY a -- limit removed")
      == "SELECT a FROM t")
    assert(Verify.stripTrailingOrderBy("SELECT a FROM t ORDER BY a /* fetch later */")
      == "SELECT a FROM t")
  }

  test("stripTrailingOrderBy: LIMIT inside a literal or quoted identifier is not the keyword") {
    // a sort key that is a string literal containing LIMIT
    assert(Verify.stripTrailingOrderBy("SELECT a FROM t ORDER BY 'LIMIT 5', a")
      == "SELECT a FROM t")
    // a quoted column unfortunately NAMED limit is an identifier, not the clause
    assert(Verify.stripTrailingOrderBy("SELECT a FROM t ORDER BY \"limit\"")
      == "SELECT a FROM t")
  }

  test("stripTrailingOrderBy: a real trailing LIMIT/OFFSET/FETCH still keeps the sort") {
    val l = "SELECT a FROM t ORDER BY a LIMIT 5"
    assert(Verify.stripTrailingOrderBy(l) == l)
    val f = "SELECT a FROM t ORDER BY a FETCH FIRST 3 ROWS ONLY"
    assert(Verify.stripTrailingOrderBy(f) == f)
  }

  test("blankCommentsAndLiterals: delimiters survive, interiors and comments blank") {
    assert(Verify.blankCommentsAndLiterals("a 'b--c' d -- gone\ne /* x */ f")
      == "a '    ' d \ne   f")
  }

  test("s_bucketed_join gate equals the direct unbucketed join") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getDouble(2))
    val got = SparkEntry.queries("s_bucketed_join")(spark, d)
      .collect().map(key).toSeq
    val exp = Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)"))
          .cast("decimal(18,2)").cast("double").as("sum_price"))
      .orderBy("c_mktsegment").collect().map(key).toSeq
    assert(got.nonEmpty && got == exp)
  }

  test("stream_jdbc_append end state equals the batch aggregate, and re-runs do not accumulate") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val exp = Tables.events(spark, d)
      .where(col("event_id") % 20 === 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).cast("long").as("id_sum"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type").collect().map(key).toSeq
    val got = SparkEntry.queries("stream_jdbc_append")(spark, d)
      .collect().map(key).toSeq
    assert(got.nonEmpty && got == exp)
    // a second in-process run appends into a FRESH scratch db — identical
    // result, no rows surviving from the first run's table
    val again = SparkEntry.queries("stream_jdbc_append")(spark, d)
      .collect().map(key).toSeq
    assert(again == exp)
  }
}
