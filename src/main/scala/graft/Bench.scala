package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at the
  * SPARK_GRAFT_SF_DIR scale factor and prints ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the machine (the target is local[32]-class hardware);
    // SPARK_GRAFT_CPUS pins it for reproducible small runs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    // realistic-exchange posture (BENCH_SCALE control runs): a cluster plan
    // pays per-partition fixed costs the local cpus-partition default
    // hides — SPARK_GRAFT_SHUFFLE_PARTITIONS=200 SPARK_GRAFT_AQE=1 times
    // the same queries under cluster-shaped exchanges + runtime re-plan
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // scale-curve runs (BENCH_SCALE control): a cluster reads N× data as
    // ~N× fixed-size blocks, but the single-file TESTDATA layout reads it
    // as ONE split until 128 MB — per-task input then grows with scale and
    // scan-stage wall-clock scales serially, which is a harness artifact,
    // not a plan property. Pinning e.g. 4m keeps bytes-per-task constant
    // across scale points, the honest cluster-shaped posture.
    val maxPartitionBytes =
      sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // AQE stays at the session default unless explicitly pinned, so anchor
    // comparability is unchanged when the knob is absent
    val b = sys.env.get("SPARK_GRAFT_AQE") match {
      case Some(v) => b0.config("spark.sql.adaptive.enabled", v == "1")
      case None => b0
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: fault every table into the page cache and execute the
    // signature/similarity code paths on tiny slices, so timed queries
    // measure the operators rather than first-run JIT + codegen compilation
    // (measured ~6 s of one-time cost attributed to whichever doc-heavy
    // query happened to run first)
    Tables.names.foreach { n =>
      try Tables.table(spark, sfDir, n).count()
      catch { case _: Throwable => }
    }
    try {
      val docs = Tables.documents(spark, sfDir).limit(64).cache()
      val emb = Tables.embeddings(spark, sfDir).limit(64).cache()
      ops.Dedup.simhashNearDup(docs).count()
      ops.Dedup.minhashLsh(docs).count()
      ops.SimSearch.bruteForceTopK(emb, 2, 3).count()
      ops.SimSearch.lshTopK(emb, 2, 3).count()
      docs.unpersist(); emb.unpersist()
      // join/aggregate codegen warmup on 64-row slices: the first timed join
      // query otherwise pays ~0.5 s of one-time whole-stage compilation
      val li = Tables.lineitem(spark, sfDir).limit(64).cache()
      val ord = Tables.orders(spark, sfDir).limit(64).cache()
      ops.Relational.topUrgentOrders(
        Tables.customer(spark, sfDir).limit(64), ord, li).count()
      // distributed-rank + session-window paths: their mapPartitions/
      // MergingSessions codegen is another ~2 s of one-time cost that
      // otherwise lands on whichever rank/window query runs first
      ops.Relational.priorityPriceRanks(ord).count()
      li.unpersist(); ord.unpersist()
      val ev = Tables.events(spark, sfDir).limit(64).cache()
      ops.Relational.sessionCounts(ev).count()
      ev.unpersist()
    } catch { case _: Throwable => }
    // headline set by default (the driver contract's "headline queries");
    // SPARK_GRAFT_BENCH_ALL=1 times the whole inventory
    val names0 =
      if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
        SparkEntry.queries.keys.toSeq.sorted
      else SparkEntry.headlineQueries
    // local iteration: SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(only) => only.split(",").toSeq.filter(SparkEntry.queries.contains)
      case None => names0
    }
    // median of `reps` timed runs per query (default 3): a single run is
    // hostage to machine-load noise — the r04 driver recording doubled two
    // queries that the builder's run minutes earlier timed at half, purely
    // from co-tenant load. The median discards one bad draw per side while
    // staying cheap; SPARK_GRAFT_BENCH_REPS=1 restores single-shot for the
    // (slow) full-inventory sweep.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // carried ACROSS queries, not per-query: a heavy query's final rep
    // leaves its shuffle garbage behind just like an intermediate rep
    // does, and the next query's first timed rep would otherwise pay for
    // it — per-query reset made the gate blind to exactly that handoff
    var prevRepSec = 0.0
    val results = names.map(n => n -> SparkEntry.queries(n)).map { case (name, fn) =>
      // a failed query reports -1, NOT its elapsed time — a regression must
      // show up as broken, never as "fast"
      val times = (1 to reps).map { _ =>
        // drop persisted data between reps: operators that persist an
        // intermediate (minhashLsh's token projection) would otherwise hand
        // reps 2+ a warm cache and the median would report a number no
        // cold run can reproduce
        spark.catalog.clearCache()
        // clearCache only empties the Dataset-level CacheManager;
        // localCheckpoint(true) blocks (tfidfSimilarPairs' weight frame,
        // robustOutliers' ranked parts, Ml's quantized grid) are RDD-level
        // and otherwise accumulate across reps until the ContextCleaner's
        // GC happens to fire — at replica scales the residue evicts live
        // blocks and the later reps (so the median) pay for state no
        // single cold run carries. Unpersisting BETWEEN reps never forces
        // a truncated-lineage recompute: the next rep rebuilds its whole
        // plan from the source tables. blocking = true: eviction runs
        // OUTSIDE the timed window (t0 is taken after this line), so the
        // synchronous wait is free — an async unpersist could still be
        // evicting blocks when the next rep's clock starts, re-admitting
        // exactly the cross-rep interference this cleanup exists to stop
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        // ... and release the PREVIOUS rep's shuffle files: Spark frees a
        // shuffle's disk blocks only when the ContextCleaner notices its
        // ShuffleDependency is unreachable, which needs a JVM GC — without
        // one, reps accumulate dead shuffle data (14.7 GB/rep for the
        // biggest 256x row) until later reps pay page-cache/disk pressure
        // no single cold run carries. Measured at 256x replicas:
        // dedup_prefix_filter median-of-5 read 76.9 s vs 54.5 s single-shot
        // PURELY from this accumulation, turning a linear 1.98x octave
        // into a phantom 3.3x. Gated on the previous rep's cost: a full
        // GC on a 48 GB heap is ~1-2 s, and the 210-query inventory at
        // sf0.1 would pay ~630 of them for reps whose shuffles are a few
        // MB — only a rep heavy enough to have spilled real shuffle data
        // (>5 s, the serial-wall floor convention) warrants the sweep.
        // The GC runs OUTSIDE the timed window (t0 is after), so the
        // pause never lands in a reading.
        if (prevRepSec > 5.0) System.gc()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          prevRepSec = (System.nanoTime() - t0) / 1e9
          prevRepSec
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            // a failed rep still ran (and shuffled) for this long — feed
            // the GC gate its real elapsed rather than the previous
            // SUCCESSFUL rep's stale value
            prevRepSec = (System.nanoTime() - t0) / 1e9
            -1.0
        }
      }
      if (times.contains(-1.0)) name -> -1.0
      else name -> times.sorted.apply(reps / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total covers SUCCESSFUL queries only: summing the -1.0 failure
    // sentinels would make a broken query subtract from (i.e. improve) the
    // headline number; per-query -1.0 entries still mark the failures
    val total = results.map(_._2).filter(_ >= 0).sum
    // "failed" makes a partial total machine-detectable: a consumer
    // comparing only "value" across rounds would otherwise read a round
    // with a broken (excluded) query as faster, not broken
    val failed = results.count(_._2 < 0)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,""" +
        s""""queries":$qs,"sf":"$sfDir"}"""
    // stdout is the contract (run/outputStrategy in build.sbt keeps it
    // unprefixed); the file is the belt-and-braces copy a log-scraping
    // driver can read even if a wrapper mangles stdout
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "/root/repo/bench_out.json")),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
