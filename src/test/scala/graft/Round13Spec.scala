package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Corpus, Profile, Rank, TextOps}

/** Round-13 regressions: the idf-grid .5-boundary guard, the decimal(38)
  * jaccard_micro arithmetic, and the targets-addressed discPercentiles
  * final stage (order statistics resolved on the P×groups metadata and
  * broadcast back as a filter, not attached to every row). */
class Round13Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ---- idf .5-boundary guard ----------------------------------------------

  test("assertIdfSiteClear: fires within 1e-6 of a .5 boundary, passes clear") {
    // search the real gate band (df ≤ 100) for a site that lands within
    // 1e-6 of .5 — the guard must refuse it loudly
    val hit = (2L to 400000L).iterator.flatMap { nd =>
      (1L to 100L).iterator.filter { dfv =>
        dfv < nd && {
          val x = 1000d * math.log((nd + 1).toDouble / (dfv + 1))
          val f = x - math.floor(x)
          math.abs(f - 0.5) <= 1e-6
        }
      }.map(dfv => (nd, dfv))
    }.buffered.headOption
    assert(hit.nonEmpty, "no near-boundary (N, df) site found in search range")
    val (nd, dfv) = hit.get
    val e = intercept[IllegalArgumentException](
      TextOps.assertIdfSiteClear(nd, dfv))
    assert(e.getMessage.contains(".5 rounding boundary"))
    // a clear site passes (the sf-testdata N/df values all are — the gate
    // proves that; this pins one analytically: ln(2)·1000 = 693.147)
    TextOps.assertIdfSiteClear(3L, 1L)
  }

  test("tfidfSimilarPairs still runs its guard end-to-end (clear corpus ok)") {
    val docs = Seq(
      (1L, "x y z x y z"), (2L, "x y z x y z"),
      (3L, "p q r s t u"), (4L, "p q r s t u")
    ).toDF("doc_id", "text")
    // the identical pairs still score exactly 10⁶ with the guard columns
    // carried through the checkpoint
    val got = TextOps.tfidfSimilarPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 1000000L)
  }

  // ---- decimal(38) jaccard_micro ------------------------------------------

  test("jaccardMicroExpr: exact past the int64·10⁶ wrap point") {
    // n_shared = 10¹³ wraps the old `n_shared * 1000000L` int64 form
    // (10¹⁹ > 9.2·10¹⁸); decimal(38) arithmetic stays exact
    val df = Seq((10000000000000L, 15000000000000L, 15000000000000L))
      .toDF("n_shared", "na", "nb")
    assert(df.select(Corpus.jaccardMicroExpr.as("j")).head().getLong(0)
      == 500000L) // ⌊10¹³·10⁶ / 2·10¹³⌋
    val small = Seq((2L, 2L, 3L)).toDF("n_shared", "na", "nb")
    assert(small.select(Corpus.jaccardMicroExpr.as("j")).head().getLong(0)
      == 666666L) // floor, not round
  }

  // ---- targets-addressed discPercentiles ----------------------------------

  test("discPercentiles: matches driver-side sort on ties/skew/multi-q") {
    val rnd = new scala.util.Random(13)
    // tie-heavy values so positions land inside tie runs, plus a 1-row
    // group and a group spanning many partitions
    val rows = Seq.tabulate(5000)(i =>
      ("g" + (i % 3), rnd.nextInt(40).toDouble)) :+ (("solo", 7.0))
    val df = rows.toDF("g", "v")
    val qs = Seq((1, 100), (1, 2), (51, 100), (99, 100))
    val names = Seq("p1", "p50", "p51", "p99")
    val got = Rank.discPercentiles(df, Seq("g"), "v", qs, names)
      .collect().map(r => r.getString(0) ->
        names.indices.map(i => r.getDouble(i + 1))).toMap
    val expected = rows.groupBy(_._1).map { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      g -> qs.map { case (num, den) =>
        sorted(((sorted.length.toLong * num + den - 1) / den).toInt - 1)
      }
    }
    expected.foreach { case (g, exp) => assert(got(g) == exp, s"group $g") }
  }

  test("discPercentiles global (empty groupCols) matches driver-side sort") {
    val rnd = new scala.util.Random(31)
    val vals = Seq.fill(4000)(rnd.nextInt(50).toLong)
    val df = vals.map(Tuple1(_)).toDF("v")
    val got = Rank.discPercentiles(df, Seq.empty, "v",
      Seq((1, 4), (1, 2), (3, 4)), Seq("q1", "q2", "q3")).head()
    val sorted = vals.sorted
    val exp = Seq((1, 4), (1, 2), (3, 4)).map { case (num, den) =>
      sorted(((sorted.length.toLong * num + den - 1) / den).toInt - 1)
    }
    assert((0 until 3).map(got.getLong) == exp)
  }

  test("discPercentiles plan: broadcast targets filter, no row-level rank join") {
    val df = Seq.tabulate(100)(i => ("g" + (i % 2), i.toDouble)).toDF("g", "v")
    val plan = Rank.discPercentiles(df, Seq("g"), "v",
      Seq((1, 2)), Seq("med")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"targets must come back as a broadcast filter join:\n$plan")
  }

  // ---- aggregate fingerprint (scaled-sweep comparator for quadratic-
  // output queries) ---------------------------------------------------------

  test("Verify.fingerprint: order-invariant, value-sensitive, null-safe") {
    val a = Seq((1L, "x"), (2L, null: String), (3L, "z")).toDF("id", "s")
    val fpA = Verify.fingerprint(a).head()
    assert(fpA.getLong(0) == 3L)
    // row order must not matter (commutative sum)
    val shuffled = Seq((3L, "z"), (1L, "x"), (2L, null: String)).toDF("id", "s")
    assert(Verify.fingerprint(shuffled).head().getString(1) == fpA.getString(1))
    // column order must not matter (canonical name sort)
    val swapped = Seq(("x", 1L), (null: String, 2L), ("z", 3L)).toDF("s", "id")
    assert(Verify.fingerprint(swapped).head().getString(1) == fpA.getString(1))
    // one changed value must change the sum
    val mutated = Seq((1L, "x"), (2L, null: String), (3L, "Z")).toDF("id", "s")
    assert(Verify.fingerprint(mutated).head().getString(1) != fpA.getString(1))
    // empty input: (0, "0"), not a NULL sum
    val empty = a.where(lit(false))
    val fpE = Verify.fingerprint(empty).head()
    assert(fpE.getLong(0) == 0L && fpE.getString(1) == "0")
  }

  test("Verify.fingerprint rejects float-typed columns loudly") {
    val d = Seq((1L, 0.5)).toDF("id", "v")
    val e = intercept[IllegalArgumentException](Verify.fingerprint(d))
    assert(e.getMessage.contains("cross-engine-stable"))
  }

  test("robustOutliers: no InMemoryRelation left to trip stableLocal") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val plan = Profile.robustOutliers(orders)
      .queryExecution.optimizedPlan.collectWithSubqueries {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }
    assert(plan.isEmpty,
      "med must be RDD-checkpointed, not cached — a cached relation forces " +
        "the MAD ranking to materialize its entire ranked frame")
  }
}
