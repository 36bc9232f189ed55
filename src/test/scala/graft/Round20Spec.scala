package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-20 regressions: the SAMPLED fingerprint (exact n_rows + 1-in-mod
  * hashed sample) that retires the replica-scale md5-bound oracle SKIPs
  * for the interval-overlap joins, and the StageProbe few-task-balanced
  * annotation. Cross-ENGINE parity of the sample predicate (Spark vs
  * DuckDB `%`/epoch_us/DATE-arithmetic semantics) is proven by the sf0.01
  * check_oracle run the sweep performs before trusting any replica scale
  * — these tests pin the Spark side's semantics and the generated SQL. */
class Round20Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // mirror of the sample mixer in plain Scala — an independent derivation
  // the Column expression must agree with row-for-row
  private def mixerRef(vals: Seq[Option[Long]], mod: Long): Boolean = {
    val primes = Verify.SamplePrimes
    val s = vals.zipWithIndex.map { case (v, i) =>
      (v.getOrElse(-1L) % 1000003L) * primes(i % primes.length)
    }.sum
    s % mod == 0
  }

  test("fingerprintSampled: exact n_rows, sample matches the reference mixer") {
    val rows = (1L to 500L).map(i =>
      (i, i * 37L % 211L, if (i % 7 == 0) None else Some(i * i)))
    val df = rows.toDF("a", "b", "c")
    val mod = 8L
    val fp = Verify.fingerprintSampled(df, mod).head()
    assert(fp.getLong(0) == 500L)
    val expectSampled = rows.count { case (a, b, c) =>
      // sorted-by-name field order: a, b, c
      mixerRef(Seq(Some(a), Some(b), c), mod)
    }
    assert(fp.getLong(1) == expectSampled.toLong,
      s"engine sampled ${fp.getLong(1)} rows, reference mixer says $expectSampled")
    assert(expectSampled > 0 && expectSampled < 500,
      "degenerate sample — the mixer test proves nothing")
  }

  test("fingerprintSampled: order-invariant, sensitive to a sampled-row edit") {
    val base = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "s")
    val mod = 4L
    val a = Verify.fingerprintSampled(base, mod).head()
    val shuffled = Verify.fingerprintSampled(
      base.orderBy(rand(42)), mod).head()
    assert(a.getString(2) == shuffled.getString(2) &&
      a.getLong(1) == shuffled.getLong(1))
    // find a sampled id and corrupt its STRING column: the predicate
    // (non-string cols only) keeps the row sampled, the hash must move
    val sampledId = (1L to 200L).find(i => mixerRef(Seq(Some(i)), mod)).get
    val mutated = base.withColumn("s",
      when(col("id") === sampledId, lit("CORRUPT")).otherwise(col("s")))
    val m = Verify.fingerprintSampled(mutated, mod).head()
    assert(m.getLong(0) == a.getLong(0) && m.getLong(1) == a.getLong(1))
    assert(m.getString(2) != a.getString(2),
      "a corrupted sampled row did not move the sampled hash")
  }

  test("fingerprintSampled: timestamp/date/bool reductions + empty input") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-03-01 10:30:00"),
        java.sql.Date.valueOf("2024-03-01"), true, 5L),
      (java.sql.Timestamp.valueOf("2024-03-02 11:00:00"),
        java.sql.Date.valueOf("2024-03-02"), false, 6L)
    ).toDF("ts", "d", "b", "n")
    // runs without error and counts exactly
    val fp = Verify.fingerprintSampled(df, 3L).head()
    assert(fp.getLong(0) == 2L && fp.getLong(1) <= 2L)
    val empty = Verify.fingerprintSampled(df.limit(0), 3L).head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L &&
      empty.getString(2) == "0")
  }

  test("fingerprintSampled rejects all-string schemas and mod<=1 loudly") {
    val d = Seq("x", "y").toDF("s")
    val e = intercept[IllegalArgumentException](
      Verify.fingerprintSampled(d, 4L))
    assert(e.getMessage.contains("non-string column"))
    val ids = Seq(1L).toDF("id")
    intercept[IllegalArgumentException](Verify.fingerprintSampled(ids, 1L))
  }

  test("fingerprintSampledOracle: mirrors the predicate with field-position primes") {
    val schema = Seq((1L, "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("user_id", "label", "ts").schema
    val sql = Verify.fingerprintSampledOracle("SELECT 1", schema, 1024L)
    // sorted field order: label(0, string → skipped), ts(1), user_id(2)
    assert(sql.contains("AS n_rows") && sql.contains("AS n_sampled") &&
      sql.contains("AS hash_sum"))
    assert(sql.contains("epoch_us(\"ts\")"))
    // ts is field index 1 → prime 7919; user_id index 2 → prime 104729
    assert(sql.contains(s"""(coalesce(epoch_us("ts"), -1) % 1000003) * 7919"""))
    assert(sql.contains(s"""(coalesce("user_id"::BIGINT, -1) % 1000003) * 104729"""))
    assert(sql.contains("% 1024 = 0"))
    // the skipped string column still participates in the ROW hash
    assert(sql.contains("""md5("label"::VARCHAR)"""))
  }

  test("oracleJson sampleMod>1 emits the sampled wrapper, =1 the exact one") {
    val k = "join_interval_overlap"
    val schema = Seq((1L, 2L)).toDF("user_id", "overlap_us").schema
    val schemas = new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()
    schemas.put(k, schema)
    val sampled = Verify.oracleJson(Some(Set(k)), Set(k), schemas, 1024L)
    assert(sampled.contains("n_sampled") && sampled.contains("% 1024 = 0"))
    val exact = Verify.oracleJson(Some(Set(k)), Set(k), schemas)
    assert(!exact.contains("n_sampled"))
  }

  test("topKPerKey partial pre-combine is exact: dup ids, boundary ties, any split") {
    // adversarial corpus for the map-side partial top-k: duplicate
    // event_ids whose max-value copy can be locally pruned, exact value
    // ties at the board boundary (tiebreak id asc), interleaved keys —
    // the final LIVE board must equal the brute-force fold of ALL rows,
    // for whatever partitioning the micro-batches happen to have
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    val rnd = new scala.util.Random(20)
    val rows = (1 to 5000).map { i =>
      TopKIn(s"k${rnd.nextInt(3)}", rnd.nextInt(400).toLong,
        (rnd.nextInt(25) * 10).toDouble) // coarse values force many ties
    }
    val src = MemoryStream[TopKIn](spark)
    val q = Streaming.topKPerKey(spark, src.toDF(), k = 3)
      .writeStream.format("memory").queryName("r20_topk")
      .outputMode("append").start()
    try {
      rows.grouped(1700).foreach { b => src.addData(b: _*); q.processAllAvailable() }
      val emitted = spark.table("r20_topk").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      // brute-force expected live board: collapse by (key,id) max value,
      // order (v desc, id asc), take 3 per key
      val expect = rows.groupBy(_.event_type).map { case (key, rs) =>
        key -> rs.groupBy(_.event_id).toSeq
          .map { case (id, vs) => (vs.map(_.value).max, id) }
          .sortBy { case (v, id) => (-v, id) }.take(3)
          .zipWithIndex.map { case ((v, id), i) => (i + 1, id, v) }
      }
      for ((key, board) <- expect) {
        val live = emitted.filter(_._1 == key).takeRight(board.size)
          .map(t => (t._2, t._3, t._4)).toSeq
        assert(live == board, s"live board for $key: $live != $board")
      }
    } finally q.stop()
  }

  test("StageProbe.fewTaskBalanced: balanced few-task stages annotated, walls not") {
    import StageProbe.fewTaskBalanced
    // 4 tasks, perfectly balanced: annotate
    assert(fewTaskBalanced(tasks = 4, taskMs = 40000, maxTaskMs = 10000))
    // 4 tasks but one did nearly everything: a straggler, not the
    // partition-count class
    assert(!fewTaskBalanced(tasks = 4, taskMs = 40000, maxTaskMs = 30000))
    // 1-task stages are never "balanced" — they are the original wall
    assert(!fewTaskBalanced(tasks = 1, taskMs = 40000, maxTaskMs = 40000))
    // >K tasks: the structural topK=1.0 argument doesn't apply
    assert(!fewTaskBalanced(tasks = 9, taskMs = 40000, maxTaskMs = 4500))
  }
}
