package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Round-14 regressions: the injective fingerprint canonical row (per-
  * column md5 — an embedded comma or the literal text "NULL" must not
  * alias across field boundaries), quoted identifiers in the generated
  * DuckDB fingerprint wrapper, and the captured-schema oracle-JSON path
  * (no builder re-invocation; failed fingerprint queries fall back to
  * the unwrapped inner SQL). */
class Round14Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ---- injective fingerprint canonical row ---------------------------------

  test("fingerprint: embedded comma cannot bleed across field boundaries") {
    // identical under the r13 comma-join ("a,b" + "," + "c" == "a" + "," +
    // "b,c"); the per-column md5 encoding must tell them apart
    val a = Seq(("a,b", "c")).toDF("x", "y")
    val b = Seq(("a", "b,c")).toDF("x", "y")
    assert(Verify.fingerprint(a).head().getString(1)
      != Verify.fingerprint(b).head().getString(1))
  }

  test("fingerprint: the literal string NULL is not an actual NULL") {
    val lit = Seq(Tuple1("NULL")).toDF("s")
    val nul = Seq(Tuple1(null: String)).toDF("s")
    assert(Verify.fingerprint(lit).head().getString(1)
      != Verify.fingerprint(nul).head().getString(1))
  }

  test("fingerprint: length-ambiguous concatenations stay distinct") {
    // "ab"+"c" vs "a"+"bc": same concat under any separator-free scheme;
    // the fixed-width per-field hash keeps fields independent
    val a = Seq(("ab", "c")).toDF("x", "y")
    val b = Seq(("a", "bc")).toDF("x", "y")
    assert(Verify.fingerprint(a).head().getString(1)
      != Verify.fingerprint(b).head().getString(1))
  }

  // ---- generated DuckDB wrapper --------------------------------------------

  test("fingerprintOracle: quotes identifiers, mirrors the md5/N encoding") {
    val schema = StructType(Seq(
      StructField("order", LongType),  // SQL keyword: needs quoting
      StructField("a b", StringType))) // space: needs quoting
    val sql = Verify.fingerprintOracle("SELECT 1", schema)
    assert(sql.contains("\"order\"::VARCHAR"), sql)
    assert(sql.contains("\"a b\"::VARCHAR"), sql)
    // per-column md5 with the N null marker, matching the engine side
    assert(sql.contains("coalesce(md5(\"a b\"::VARCHAR), 'N')"), sql)
    // an embedded double-quote in a name is doubled, not left to break SQL
    val tricky = StructType(Seq(StructField("we\"ird", LongType)))
    assert(Verify.fingerprintOracle("SELECT 1", tricky)
      .contains("\"we\"\"ird\"::VARCHAR"))
  }

  // ---- captured-schema oracle JSON -----------------------------------------

  test("oracleJson: wraps from the captured schema, not a builder re-run") {
    val k = "join_interval_overlap"
    val schemas = new java.util.concurrent.ConcurrentHashMap[String, StructType]()
    schemas.put(k, StructType(Seq(StructField("id", LongType))))
    val json = Verify.oracleJson(Some(Set(k)), Set(k), schemas)
    // wrapped: the fingerprint aggregation surrounds the inner oracle SQL
    assert(json.contains("AS n_rows"), json)
    assert(json.contains("md5"), json)
  }

  test("oracleJson: a failed fingerprint query emits a fast-failing sentinel") {
    val k = "join_interval_overlap"
    val empty = new java.util.concurrent.ConcurrentHashMap[String, StructType]()
    val json = Verify.oracleJson(Some(Set(k)), Set(k), empty)
    // no captured schema (query failed) -> a sentinel that errors instantly
    // (nonexistent column), NOT the raw inner SQL: the inner interval-
    // overlap join is inherently quadratic, and a comparator that runs the
    // oracle before checking the engine output dir must not materialize it
    assert(!json.contains("AS n_rows"), json)
    assert(json.contains(s"fingerprint_schema_missing_$k"), json)
    // the quadratic inner SQL is absent entirely: the only entry is the
    // sentinel, which contains no FROM clause (escape-free assertion — the
    // old form re-implemented Verify's JSON escaping and broke on any
    // backslash/tab in the SQL's first 40 chars)
    assert(!json.toLowerCase.contains("from"), json)
  }
}
