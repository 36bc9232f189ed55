package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 regressions: stripTrailingOrderBy must be SQL-comment-aware.
  * The scanner guards a 150 GB-sort footgun (the fingerprint oracle at
  * replica scale), so a depth-0 "ORDER BY" that is merely TEXT inside a
  * trailing `--` or slash-star comment must never be taken as the clause
  * start — truncating there would corrupt the SQL mid-comment and feed
  * DuckDB an unparsable oracle. */
class Round16Spec extends AnyFunSuite {

  test("stripTrailingOrderBy: ORDER BY inside a trailing -- comment is text, not a clause") {
    val sql = "SELECT a FROM t -- no ORDER BY needed here"
    assert(Verify.stripTrailingOrderBy(sql) == sql)
    // same with a newline after the comment: the comment ends at EOL and
    // nothing after it is a live clause either
    val sql2 = "SELECT a FROM t -- sorted? ORDER BY a\n"
    assert(Verify.stripTrailingOrderBy(sql2) == sql2)
  }

  test("stripTrailingOrderBy: ORDER BY inside a block comment is text, not a clause") {
    val sql = "SELECT a FROM t /* the old oracle had ORDER BY a here */"
    assert(Verify.stripTrailingOrderBy(sql) == sql)
    // unterminated block comment swallows the rest — nothing live follows
    val sql3 = "SELECT a FROM t /* ORDER BY a"
    assert(Verify.stripTrailingOrderBy(sql3) == sql3)
  }

  test("stripTrailingOrderBy: a real trailing ORDER BY still strips when a comment precedes it") {
    // the comment is consumed as a span; the LIVE clause after it is found
    val sql = "SELECT a FROM t /* cheap */ ORDER BY a"
    assert(Verify.stripTrailingOrderBy(sql) == "SELECT a FROM t /* cheap */")
  }

  test("stripTrailingOrderBy: a real ORDER BY followed by a trailing comment strips both") {
    // comments are semantics-free: removing the no-op sort may drop the
    // trailing comment with it — the result must stay valid SQL
    val sql = "SELECT a FROM t ORDER BY a -- stable output"
    assert(Verify.stripTrailingOrderBy(sql) == "SELECT a FROM t")
    val sql2 = "SELECT a FROM t ORDER BY a /* stable */"
    assert(Verify.stripTrailingOrderBy(sql2) == "SELECT a FROM t")
  }

  test("stripTrailingOrderBy: line comment inside a live query does not hide the clause") {
    val sql = "SELECT a FROM t -- projection\nORDER BY a"
    assert(Verify.stripTrailingOrderBy(sql)
      == "SELECT a FROM t -- projection")
  }

  test("stripTrailingOrderBy: -- inside a string literal is not a comment") {
    // a literal containing '--' must not put the scanner into comment
    // mode and skip a real trailing clause
    val sql = "SELECT a FROM t WHERE s = 'a--b' ORDER BY a"
    assert(Verify.stripTrailingOrderBy(sql) == "SELECT a FROM t WHERE s = 'a--b'")
  }
}
