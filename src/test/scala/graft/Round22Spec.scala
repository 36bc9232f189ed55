package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Round-22 optimization regression tests: the codegen local-rank pass
  * (monotonically_increasing_id arithmetic replacing the Encoders.row
  * mapPartitions), its payload-materialization guard, the pluggable
  * fan-out materialization (reliable checkpoint when a dir is set), the
  * tfIdf single-scan stage-reuse pin, and the decontaminateSemantic
  * NULL-element guard pass-through. Each pins restructured internals
  * against an independent formulation or the prior semantics. */
class Round22Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ---- codegen local rank: payload-carrying inputs ---------------------------

  test("groupRanks with payload columns equals window ranks and keeps payload") {
    // payload `p` is referenced by no sort key — the case where column
    // pruning would narrow the offsets side below the range exchange and
    // break reuse; stableLocal must materialize instead (and the ranks
    // must still match the single-window formulation row for row)
    val df = Seq(
      ("a", 3L, 1L, "p1"), ("a", 1L, 2L, "p2"), ("a", 1L, 3L, "p3"),
      ("b", 9L, 4L, "p4"), ("b", 2L, 5L, "p5"), (null, 7L, 6L, "p6"),
      (null, 7L, 7L, "p7")
    ).toDF("g", "v", "id", "p")
    val got = Rank.groupRanks(df, Seq("g"), Seq(col("v"), col("id")))
      .select("g", "v", "id", "p", "rank", "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
  }

  test("stableLocal materializes payload inputs and keeps all-key inputs lazy") {
    def hasRddScan(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l
      }.nonEmpty
    val payload = Seq(("a", 1L, 10L, 99L), ("b", 2L, 11L, 98L))
      .toDF("g", "v", "id", "pay")
    assert(hasRddScan(
      Rank.groupRanks(payload, Seq("g"), Seq(col("v"), col("id")))),
      "payload input should take the materialized (checkpoint) path")
    val allKey = Seq(("a", 1L, 10L), ("b", 2L, 11L)).toDF("g", "v", "id")
    assert(!hasRddScan(
      Rank.groupRanks(allKey, Seq("g"), Seq(col("v"), col("id")))),
      "all-key input should stay one lazy plan (shared range exchange)")
  }

  // ---- pluggable fan-out materialization -------------------------------------

  test("Materialize.once uses a reliable checkpoint when a dir is configured") {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("r22ckpt").toFile
    try {
      sc.setCheckpointDir(dir.getAbsolutePath)
      val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "s")
      val mat = Materialize.once(df)
      assert(mat.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
      // reliable checkpoint writes rdd-* block files under the configured
      // dir (localCheckpoint writes none) — the fault-tolerance contract
      def rddFiles(f: java.io.File): Int =
        Option(f.listFiles).toSeq.flatten.map { c =>
          (if (c.getName.startsWith("rdd-")) 1 else 0) + rddFiles(c)
        }.sum
      assert(rddFiles(dir) > 0, "expected reliable checkpoint files")
    } finally {
      sc.setCheckpointDir(null) // restore the local (bench) posture
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("rank results are identical under a configured checkpoint dir") {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("r22ckpt2").toFile
    val df = Seq(("a", 3L, 1L), ("a", 1L, 2L), ("b", 2L, 3L), ("b", 9L, 4L))
      .toDF("g", "v", "id")
    def run() = Rank.groupRanks(df, Seq.empty, Seq(col("v"), col("id")))
      .select("g", "v", "id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val local = run()
    try {
      sc.setCheckpointDir(dir.getAbsolutePath)
      assert(run() == local)
    } finally {
      sc.setCheckpointDir(null)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  // ---- tfIdf: the tokenize subplan materializes once (stage-reuse pin) -------

  test("tfIdf reads the corpus exactly twice: shared tokenize + the N count") {
    // The single-scan property of tfIdf is RUNTIME stage reuse, not a plan
    // shape — an innocent refactor that de-canonicalizes the tf subplan's
    // two references would silently re-tokenize the corpus with no test
    // failing (VERDICT r21 item 2). Pin it with input-row accounting: the
    // corpus must be read once for the shared tf/df subplan and once for
    // the in-plan N aggregate; a third read is the regression.
    val tmp = java.nio.file.Files.createTempDirectory("r22tfidf").toFile
    try {
      val n = 64
      spark.range(n).select(col("id").as("doc_id"),
          concat(lit("alpha beta gamma doc"), col("id").cast("string"))
            .as("text"))
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val docs = spark.read.parquet(tmp.getAbsolutePath)
      val recs = new java.util.concurrent.atomic.AtomicLong
      val submitted = new java.util.concurrent.atomic.AtomicInteger
      val completed = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          submitted.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          recs.addAndGet(s.stageInfo.taskMetrics.inputMetrics.recordsRead)
          completed.incrementAndGet()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        TextOps.tfIdf(docs, minDf = 1).write.format("noop")
          .mode("overwrite").save()
        assert(StageProbe.drain(() => submitted.get(), () => completed.get(),
          System.nanoTime() + 30L * 1000 * 1000 * 1000),
          "listener bus did not drain")
        assert(recs.get() <= 2L * n,
          s"corpus rows read ${recs.get()} > ${2 * n}: the tokenize " +
            "subplan materialized more than once")
        assert(recs.get() >= 2L * n, // sanity: both expected reads happened
          s"corpus rows read ${recs.get()} < ${2 * n}: accounting broke")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete()
      }
      rm(tmp)
    }
  }

  // ---- decontaminateSemantic: NULL-element rows pass the guard ---------------

  test("decontaminateSemantic: all-NULL-element corpus rows drop silently " +
      "instead of tripping the overflow guard") {
    val nullF: Option[Float] = None
    val emb = Seq(
      (0L, Seq.tabulate(8)(_ => Option(1.0f))),     // bench
      (10L, Seq.tabulate(8)(_ => Option(0.9f))),    // corpus hit
      (11L, Seq.tabulate(8)(_ => nullF)),           // all-NULL elements
      (12L, Option(1.0f) +: Seq.tabulate(7)(_ => nullF)) // mixed NULLs
    ).toDF("vec_id", "embedding")
    val got = Corpus.decontaminateSemantic(emb, benchMaxVecId = 2)
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(10L), "real near-duplicate must still hit")
    assert(!got.contains(11L) && !got.contains(12L),
      "NULL-element rows must score 0 and drop, not throw")
  }
}
