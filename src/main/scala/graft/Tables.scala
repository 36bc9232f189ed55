package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the TESTDATA parquet tables (TESTDATA.md).
  *
  * All engine operators take `DataFrame`s produced here, so schema quirks of
  * the on-disk files are normalized in exactly one place:
  *
  *   - `events.ts` is written as parquet INT64 TIMESTAMP(NANOS), which Spark's
  *     vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it
  *     via `spark.sql.legacy.parquet.nanosAsLong` and truncate to microseconds
  *     (`timestamp_micros(ns div 1000)`). DuckDB — the correctness oracle —
  *     stores timestamps at microsecond precision and performs the identical
  *     truncation when scanning the same file, so both engines observe the
  *     same values.
  *
  * Everything else is plain `spark.read.parquet`: the scan stays a native
  * Parquet `FileScan` so Catalyst can push filters and prune columns into it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(path(dir, name))

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Derived `partsupp` — the TESTDATA layout ships 8 TPC-H-ish tables
    * WITHOUT partsupp, which blocks the three classic join shapes built on
    * it (Q2 correlated min, Q11 share-of-total HAVING, Q20 nested semi).
    * Rather than synthesizing a parquet file the read-only oracle can't
    * see, the table is DERIVED deterministically from part × supplier with
    * pure integer arithmetic both engines replay exactly:
    *
    *   - each part gets 4 suppliers via the published TPC-H dbgen
    *     assignment `(p + i·(S/4 + p/S)) mod S`, i ∈ 0..3 (keys here are
    *     0-based, matching the TESTDATA keyspace);
    *   - `ps_availqty`       = (p·7 + s·3) mod 9999 + 1
    *   - `ps_supplycost_cents` = (p·31 + s·17) mod 99900 + 100
    *     (integer cents, 1.00..1000.00 — money stays on the integer grid,
    *     the oracle-parity discipline).
    *
    * The supplier count S is read from the supplier table (scales with sf),
    * carried by a broadcast 1-row cross join — the scalar-total pattern.
    * RNG-free, so a 100 TB re-derivation is reproducible shard by shard. */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    val s = supplier(spark, dir).agg(count(lit(1)).as("n_supp"))
    part(spark, dir).select("p_partkey")
      .crossJoin(broadcast(s))
      .withColumn("i", explode(sequence(lit(0L), lit(3L))))
      .withColumn("ps_suppkey",
        expr("(p_partkey + i * (n_supp div 4 + p_partkey div n_supp)) % n_supp"))
      .select(
        col("p_partkey").as("ps_partkey"),
        col("ps_suppkey"),
        expr("(p_partkey * 7 + ps_suppkey * 3) % 9999 + 1").as("ps_availqty"),
        expr("(p_partkey * 31 + ps_suppkey * 17) % 99900 + 100")
          .as("ps_supplycost_cents"))
  }

  /** `events` with `ts` as a microsecond TimestampType column (see scaladoc).
    *
    * NOTE: setting `nanosAsLong` is a SESSION-level conf — after this call,
    * other parquet reads in the same session will also map TIMESTAMP(NANOS)
    * columns to raw longs instead of failing fast. That is the intended
    * behavior for this harness (events is the only nanos table and every
    * load goes through here), but a general-purpose caller mixing in their
    * own nanos-timestamp tables should be aware their `ts` columns arrive
    * as longs WITHOUT the µs truncation applied below. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
