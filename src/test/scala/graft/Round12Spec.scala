package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Corpus, Dedup, TextOps}

/** Round-12 regressions: the integer-grid quantization of the two former
  * float-threshold gate queries (tf-idf pair scores, source-overlap
  * Jaccard) and the Spread pre-spread of the CPU-dense fingerprint stages
  * that the 32× scale curve flushed out. */
class Round12Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ---- integer-grid contracts ----------------------------------------------

  test("sourceOverlap: jaccard_micro is FLOOR division (2/3 -> 666666, not 667k)") {
    // n = 3 shingles on sub-3-token docs collapse to the whole doc as one
    // gram: s1 = {a, b}, s2 = {a, b, c} -> shared 2, union 3
    val docs = Seq(
      (1L, "a", "s1"), (2L, "b", "s1"),
      (3L, "a", "s2"), (4L, "b", "s2"), (5L, "c", "s2")
    ).toDF("doc_id", "text", "source")
    val got = Corpus.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("s1", "s2", 2L, 666666L))) // ⌊2·10⁶/3⌋
  }

  test("tfidfSimilarPairs: disjoint same-norm pairs absent, micro grid exact") {
    // two identical docs with a rare repeated shingle, plus fillers that
    // push df below N so the idf is non-zero; the identical pair must hit
    // cos2_micro == 10⁶ exactly (integer arithmetic, no float residue)
    val docs = Seq(
      (1L, "x y z x y z x y z"),
      (2L, "x y z x y z x y z"),
      (3L, "p q r s t u v w"),
      (4L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val got = TextOps.tfidfSimilarPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 1000000L)
    assert(got((3L, 4L)) == 1000000L)
    assert(!got.contains((1L, 3L)))
  }

  test("tfidfSimilarPairs: g·m² overflow guard fires loudly, not silently wraps") {
    // one shared banded gram repeated ~80k times per doc: tf·idf_milli ≈
    // 8·10⁴ × 693 ≈ 5.5·10⁷, g·m² ≈ 3.1·10¹⁵ > the 3e15 decimal(38) bound.
    // Fillers keep df (2) < N (5) so idf_milli = round(1000·ln(6/3)) = 693.
    val big = Array.fill(80002)("tok").mkString(" ")
    val docs = Seq(
      (1L, big), (2L, big),
      (3L, "f1 f2 f3"), (4L, "f4 f5 f6"), (5L, "f7 f8 f9")
    ).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      TextOps.tfidfSimilarPairs(docs).collect())
    assert(e.getMessage.contains("int64/decimal(38)-safe"))
  }

  test("blocked fuzzy linkage never broadcasts its self-join") {
    // while the build-side ESTIMATE is under the broadcast threshold Spark
    // plans the block self-join as BroadcastHashJoin and the in-block pair
    // explosion + lev verify inherit the probe SCAN's split count (1-3
    // tasks on a single parquet file) — measured 27 s of 27.7 s in one
    // task on the 64× replica. The shuffle_hash hint pins a block-hashed
    // exchange so verify width is shuffle.partitions at every scale.
    val cust = (0L until 64L).map(i => (i, s"Customer#$i"))
      .toDF("c_custkey", "c_name")
    // assert via fuzzyLinkBlocked: it shares blockedNamePairs (ONE pair
    // definition) with fuzzyEntityClusters, whose own final plan hides the
    // join behind connectedComponents' eager checkpoint
    val plan = Dedup.fuzzyLinkBlocked(cust).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the block self-join to shuffle:\n${plan.take(1500)}")
    assert(!plan.contains("BroadcastHashJoin"),
      s"block self-join must not broadcast:\n${plan.take(1500)}")
  }

  // ---- Spread engagement on the fingerprint stages -------------------------

  test("simhashNearDup and minhashLsh pre-spread an under-split scan") {
    // a tiny local relation always estimates far below one scan split, so
    // Spread.toCores must inject a round-robin exchange before the
    // CPU-dense fingerprint expressions (on a real many-split scan the
    // same call is a no-op) — this is what turned the 32× curve's serial
    // fingerprint stages (10.3 s / 5.8 s) into parallel ones (3.8 / 3.5)
    val docs = (0L until 32L).map(i => (i, s"tok$i a b c d e f g h"))
      .toDF("doc_id", "text")
    val simPlan = Dedup.simhashNearDup(docs).queryExecution.executedPlan.toString
    assert(simPlan.contains("RoundRobinPartitioning"),
      s"expected a Spread round-robin exchange in:\n${simPlan.take(2000)}")
    // minhashLsh eagerly materializes its token projection since round 22
    // (concurrent-consumer cache race), so the spread exchange runs inside
    // the materialization job and the FINAL plan shows the checkpointed
    // RDD instead. Assert the barrier is there and that the materialized
    // blocks carry the spread's partition count (cores, not the tiny
    // relation's single split) — the same engagement, observed one level
    // down.
    val lsh = Dedup.minhashLsh(docs)
    val lshPlan = lsh.queryExecution.executedPlan.toString
    assert(lshPlan.contains("Scan ExistingRDD"),
      s"expected the eager token materialization barrier in:\n${lshPlan.take(2000)}")
    val matParts = lsh.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getNumPartitions
    }
    assert(matParts.exists(_ > 1),
      s"expected the materialized token blocks spread across cores, got $matParts")
  }
}
