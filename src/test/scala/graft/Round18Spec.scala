package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-18 regressions: (1) blankCommentsAndLiterals must lex SQL's
  * doubled-quote escape ('' inside a literal, "" inside a quoted
  * identifier) as part of the enclosing token, not as close-then-open —
  * the toggle form left literal state flipped after the escape, so a
  * later LIMIT-in-literal could read as live SQL and conservatively
  * retain the no-op sort the function exists to prune; (2) StageProbe
  * must mark an expired drain deadline MACHINE-READABLY (partial=true in
  * the headline), not just with a printed warning — an octave
  * adjudication that consumes under-reported task totals silently is
  * worse than no probe. */
class Round18Spec extends AnyFunSuite {

  test("blankCommentsAndLiterals: '' is an escaped quote inside a literal, not close-then-open") {
    // after 'it''s' the lexer must be OUTSIDE the literal: the trailing
    // LIMIT is live SQL and must survive blanking
    val out = Verify.blankCommentsAndLiterals("'it''s' LIMIT 5")
    assert(out.contains("LIMIT"), out)
    // and the escape itself stays blanked (no literal text leaks)
    assert(!out.contains("it"), out)
    // with the toggle form, text after a doubled quote was LIVE: make
    // sure a LIMIT inside the post-escape half of one literal stays dark
    val out2 = Verify.blankCommentsAndLiterals("'half'' LIMIT 5 still literal'")
    assert(!out2.contains("LIMIT"), out2)
  }

  test("blankCommentsAndLiterals: \"\" is an escaped quote inside a quoted identifier") {
    val out = Verify.blankCommentsAndLiterals("\"we\"\"ird\" LIMIT 5")
    assert(out.contains("LIMIT"), out)
    assert(!out.contains("ird"), out)
  }

  test("stripTrailingOrderBy: ORDER BY 'it''s' strips; escape does not flip literal state") {
    assert(Verify.stripTrailingOrderBy("SELECT a FROM t ORDER BY 'it''s', a")
      == "SELECT a FROM t")
    // LIMIT living entirely inside a doubled-quote literal is NOT the
    // keyword — the sort is still a prunable no-op
    assert(Verify.stripTrailingOrderBy("SELECT a FROM t ORDER BY 'don''t LIMIT'")
      == "SELECT a FROM t")
    // a REAL limit after an escaped literal is semantic — kept
    val kept = "SELECT a FROM t ORDER BY 'it''s' LIMIT 5"
    assert(Verify.stripTrailingOrderBy(kept) == kept)
  }

  test("StageProbe.drain: expired deadline with events still owed returns false (partial)") {
    // synthetic stall: one submission whose completion never arrives
    val t0 = System.nanoTime()
    val drained = StageProbe.drain(() => 1, () => 0,
      deadlineNs = System.nanoTime() + 300L * 1000 * 1000,
      quietNs = 50L * 1000 * 1000, sleepMs = 10)
    assert(!drained)
    // and it respected the deadline rather than spinning forever
    assert(System.nanoTime() - t0 < 5L * 1000 * 1000 * 1000)
    assert(StageProbe.probeHeader("q", 1, 1.0, "sf", partial = true)
      .contains("partial=true"))
  }

  test("StageProbe.serialWall: flags one-task-did-everything stages, stays quiet on tiny or balanced ones") {
    // the r17 repetitionStats shape: one task carries the whole stage
    // (its runtime IS the top-K sum when it's the only heavy task)
    assert(StageProbe.serialWall(taskMs = 45L * 60 * 1000,
      topMs = 45L * 60 * 1000))
    // a balanced 32-task stage: top-4 sum is ~4/32 of the total
    assert(!StageProbe.serialWall(taskMs = 32000, topMs = 4000))
    // a tiny single-task metadata agg: serial but beneath the floor
    assert(!StageProbe.serialWall(taskMs = 400, topMs = 400))
  }

  test("StageProbe.serialWall: the r18-verdict gap — a two-straggler wall — now flags") {
    // two stragglers at ~0.5 of the stage each: max-task/total = 0.5 slid
    // under the old 0.9 max-only verdict; the top-4 sum reads 1.0
    val straggler = 20L * 1000
    assert(StageProbe.serialWall(taskMs = 2 * straggler,
      topMs = 2 * straggler))
    // and a genuinely 8-way-balanced stage of the same size stays quiet
    // (top-4 of 8 equal tasks = half the total, under the 0.9 line)
    assert(!StageProbe.serialWall(taskMs = 8 * straggler,
      topMs = 4 * straggler))
  }

  test("StageProbe.drain: caught-up counters drain clean after the quiet period") {
    val drained = StageProbe.drain(() => 3, () => 3,
      deadlineNs = System.nanoTime() + 5L * 1000 * 1000 * 1000,
      quietNs = 50L * 1000 * 1000, sleepMs = 10)
    assert(drained)
    assert(StageProbe.probeHeader("q", 1, 1.0, "sf", partial = false)
      .contains("partial=false"))
  }
}
