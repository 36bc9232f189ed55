package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Round-15 regressions: the fingerprint oracle wrapper must not carry the
  * inner SQL's trailing ORDER BY into DuckDB — count + a commutative sum
  * cannot observe row order, DuckDB does not prune a subquery ORDER BY,
  * and at 32× that no-op sort of the 4·10⁹-row interval-join output
  * (~150 GB of sort state for a 1-row aggregate) rode the comparator into
  * the kernel OOM killer at 103 GB RSS. */
class Round15Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("stripTrailingOrderBy: removes a trailing top-level ORDER BY") {
    val sql = "SELECT a, b FROM t JOIN u ON a < c\nORDER BY a, b DESC"
    assert(Verify.stripTrailingOrderBy(sql)
      == "SELECT a, b FROM t JOIN u ON a < c")
  }

  test("stripTrailingOrderBy: keeps window/subquery ORDER BY (depth > 0)") {
    // the interval-overlap oracle's sessionization uses ORDER BY inside
    // WINDOW/OVER clauses — those are parenthesized and must survive
    val sql = "WITH s AS (SELECT sum(x) OVER (PARTITION BY u ORDER BY ts) " +
      "AS r FROM t) SELECT r FROM s ORDER BY r"
    val out = Verify.stripTrailingOrderBy(sql)
    assert(out.contains("PARTITION BY u ORDER BY ts"), out)
    assert(out.endsWith("SELECT r FROM s"), out)
  }

  test("stripTrailingOrderBy: ORDER BY followed by LIMIT is semantic — kept") {
    val sql = "SELECT a FROM t ORDER BY a LIMIT 5"
    assert(Verify.stripTrailingOrderBy(sql) == sql)
  }

  test("stripTrailingOrderBy: quoted strings and identifiers do not confuse it") {
    // 'ORDER BY' inside a string literal and a quoted "order" identifier
    // are not clause keywords
    val sql = "SELECT \"order\" FROM t WHERE s <> 'ORDER BY x'"
    assert(Verify.stripTrailingOrderBy(sql) == sql)
    // a word ending in ...order (no left boundary) is not the keyword
    val sql2 = "SELECT reorder FROM t"
    assert(Verify.stripTrailingOrderBy(sql2) == sql2)
  }

  test("fingerprintOracle: the real interval oracle wrapper has no top-level sort") {
    val inner = SparkEntry.oracleSql("join_interval_overlap")
    assert(inner.matches("(?is).*\\bORDER\\s+BY\\b.*"), inner.takeRight(80))
    val schema = StructType(Seq(
      StructField("incident_id", LongType), StructField("user_id", LongType)))
    val wrapped = Verify.fingerprintOracle(inner, schema)
    // the only surviving ORDER BYs are parenthesized (window clauses): at
    // paren depth 0 the wrapper must contain none
    var depth = 0; var inS = false; var inD = false; var i = 0
    var topLevelOrder = false
    while (i < wrapped.length) {
      val c = wrapped.charAt(i)
      if (inS) { if (c == '\'') inS = false }
      else if (inD) { if (c == '"') inD = false }
      else c match {
        case '\'' => inS = true
        case '"'  => inD = true
        case '('  => depth += 1
        case ')'  => depth -= 1
        case 'O' | 'o' if depth == 0 =>
          if (wrapped.regionMatches(true, i, "ORDER", 0, 5) &&
              wrapped.substring(i + 5).matches("(?is)\\s+BY\\b.*"))
            topLevelOrder = true
        case _ =>
      }
      i += 1
    }
    assert(!topLevelOrder, wrapped.takeRight(120))
  }

  test("fingerprint is order-insensitive: same hash with and without a sort") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("id", "s")
    val sorted = df.orderBy($"id".desc)
    assert(Verify.fingerprint(df).collect().toSeq
      == Verify.fingerprint(sorted).collect().toSeq)
  }

  test("fingerprint over the interval join plans with no engine-side sort") {
    // the DuckDB-side ORDER BY is stripped by fingerprintOracle; the
    // engine side relies on Catalyst's EliminateSorts to prune the
    // query's golden-output orderBy under the aggregate — pin that, or a
    // Spark behavior change would silently re-introduce a 4·10⁹-row sort
    // at replica scale
    val df = SparkEntry.queries("join_interval_overlap")(
      spark, "/root/testdata/sf0.001")
    val plan = Verify.fingerprint(df).queryExecution.optimizedPlan
    val sorts = plan.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s
    }
    assert(sorts.isEmpty, plan.treeString.take(800))
  }
}
