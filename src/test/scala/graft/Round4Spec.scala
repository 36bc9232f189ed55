package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ml

/** Round-4 hardening specs: loud-failure guards and replay semantics. */
class Round4Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ---- Ml.semDedup overflow guard ------------------------------------------

  test("semDedup: out-of-bound magnitude fails loudly, not as silent wrap") {
    // |x| = 2000 → quantized m = 200k on the x100 grid; d²·m⁴·400 blows
    // int64 by orders of magnitude. With ANSI off Spark would wrap
    // silently — the guard must turn that into an immediate error.
    val big = Seq(
      (0L, Seq.tabulate(64)(_ => 2000.0f)),
      (1L, Seq.tabulate(64)(d => if (d % 2 == 0) 2000.0f else -2000.0f))
    ).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Ml.semDedup(big, k = 2))
    assert(e.getMessage.contains("int64-safe bound"))
  }

  test("semDedup: in-bound magnitudes still pass the guard") {
    val ok = Seq(
      (0L, Seq.tabulate(64)(d => (d % 5).toFloat)),
      (1L, Seq.tabulate(64)(d => -(d % 7).toFloat))
    ).toDF("vec_id", "embedding")
    assert(Ml.semDedup(ok, k = 2).count() == 2)
  }
}
