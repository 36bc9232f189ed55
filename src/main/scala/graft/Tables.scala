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
