package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Reference-parity operators (SURVEY.md §2.1-§2.3), re-expressed Spark-first
  * over the TESTDATA tables. The role mapping (FIXTURES.md §A): `events.ts` ↔
  * incident Date, `event_type` ↔ Category, `user_id % 10` ↔ PdDistrict.
  *
  * Every function is DataFrame-in/DataFrame-out and purely declarative so
  * Catalyst plans the whole pipeline (scan-level column pruning, partial
  * aggregation before the shuffle, broadcast dictionary joins).
  */
object Parity {

  /** The district analog: 10 synthetic "districts" from user_id buckets. */
  def districtOf(userId: Column): Column =
    concat(lit("D"), lpad(pmod(userId, lit(10)).cast("string"), 2, "0"))

  /** A2 (`SanFranciscoCrime.ReduceByWeek`, SanFranciscoCrime.java:154-210):
    * weekly incident-count histogram per key, dense buckets. The reference
    * emits a 16-slot CSV vector; here `pivot` with an explicit bucket domain
    * restores the dense shape (absent buckets zero-filled), which also keeps
    * the output schema static for the oracle. One shuffle: the partial/final
    * HashAggregate pair Hadoop's missing combiner never provided.
    */
  def weeklyHistogram(events: DataFrame, key: Column, keyName: String,
      buckets: Seq[Int]): DataFrame =
    events
      .select(key.as(keyName), week_of_month(to_date(col("ts"))).as("w"))
      .groupBy(col(keyName))
      .pivot("w", buckets)
      .count()
      .na.fill(0L)
      .toDF(keyName +: buckets.map(b => s"w$b"): _*)
      .orderBy(col(keyName))

  /** The reference's declared-but-never-wired day-of-week mappers
    * (`CategoryMapByDotw`/`DistrictMapByDotw`, SanFranciscoCrime.java:110-126,
    * SURVEY §2.3 "unused-but-present"): histogram per key over day names. */
  def dotwHistogram(events: DataFrame, key: Column, keyName: String): DataFrame = {
    val days = Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
      "Saturday", "Sunday")
    events
      .select(key.as(keyName), date_format(col("ts"), "EEEE").as("dow"))
      .groupBy(col(keyName))
      .pivot("dow", days)
      .count()
      .na.fill(0L)
      .toDF(keyName +: days.map(_.toLowerCase): _*)
      .orderBy(col(keyName))
  }

  /** A2 in long (sparse) form: (key, bucket, n). Same aggregation without the
    * pivot — the form that scales to arbitrary bucket domains at 100 TB. */
  def weeklyHistogramLong(events: DataFrame, key: Column, keyName: String): DataFrame =
    events
      .select(key.as(keyName), month_week_bucket(to_date(col("ts"))).as("bucket"))
      .groupBy(col(keyName), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col(keyName), col("bucket"))

  /** A3 (`SanFranciscoCrimePrepOlap.Reduce`, :155-206): daily
    * date × category × district counts, naturally sparse — `groupBy.count`
    * produces only non-zero cells, exactly like the reference's non-zero
    * triplet emission. */
  def dailyCube(events: DataFrame): DataFrame =
    events
      .select(
        to_date(col("ts")).as("d"),
        col("event_type"),
        districtOf(col("user_id")).as("district"))
      .groupBy("d", "event_type", "district")
      .agg(count(lit(1)).as("n"))
      .orderBy("d", "event_type", "district")

  /** A4 (`categoryTotals.awk`): group-by-count of categories, ordered. */
  def categoryTotals(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(count(lit(1)).as("n")).orderBy("event_type")

  /** A6 (`DataFile.extractKeys` + `LoadStarDB.setup`): distinct values of a
    * column, sorted, with 1-based dense ids = sorted rank. The reference
    * assigns dictionary ids by sorted insertion order; a sorted single-pass
    * index reproduces that deterministically.
    *
    * Scale note: the id pass is single-partition by design — valid only for
    * dimension-cardinality inputs (10-40 values here; the distinct() shuffle
    * reduces to that before the index pass sees it). It was previously a
    * global `row_number` window, which computes the same thing but logs
    * Spark's single-partition-window performance warning on every run; the
    * explicit sort + stateful scan is the same one-task work without
    * pretending to be a general window. A 100 TB-scale dictionary over a
    * high-cardinality key should switch to hash ids or [[Rank.groupRanks]]
    * instead; this operator intentionally matches the reference's
    * sorted-rank contract.
    */
  def dictionary(df: DataFrame, column: String, idName: String, nameName: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val distinctVals = df.select(col(column).as(nameName))
      .where(col(nameName).isNotNull)
      .distinct()
    val outSchema = StructType(
      StructField(idName, IntegerType, nullable = false) +: distinctVals.schema.fields)
    // coalesce, not repartition: a narrow merge of the distinct's output
    // partitions into the one id-assignment task — no extra exchange round
    // (measured ~0.2 s per dictionary in stage overhead). No trailing
    // orderBy either: the single output partition is emitted already
    // sorted; query-boundary callers that EXPOSE a dictionary add their own
    // explicit sort (driver rule: total ORDER BY at the output boundary),
    // while plan-internal callers (broadcast dim joins) would pay a range
    // exchange for nothing.
    distinctVals
      .coalesce(1)
      .sortWithinPartitions(col(nameName))
      .mapPartitions { it =>
        var i = 0
        it.map { row => i += 1; Row.fromSeq(i +: row.toSeq) }
      }(Encoders.row(outSchema))
  }

  /** [[dictionary]] for UNBOUNDED-cardinality columns: same (id, name)
    * contract (dense 1-based ids in sorted order), but the rank comes from
    * [[Rank.groupRanks]]' distributed prefix sum — range-partitioned, no
    * single-task id assignment anywhere. Use when the dictionary column is
    * not a bounded dimension (user ids, URLs, doc fingerprints at corpus
    * scale); the default stays `coalesce(1)` because for true dims the
    * merge task is cheaper than an extra range exchange (measured ~0.2 s
    * per dictionary). Row-identical to [[dictionary]] (spec-asserted). */
  def dictionaryScalable(df: DataFrame, column: String, idName: String,
      nameName: String): DataFrame =
    Rank.groupRanks(
        df.select(col(column).as(nameName))
          .where(col(nameName).isNotNull)
          .distinct(),
        Seq.empty, Seq(col(nameName)))
      .select(col("rank").cast("int").as(idName), col(nameName))

  /** Session conf key selecting the dictionary build for operators that
    * don't pin one: `true` (the default) → [[dictionaryScalable]]'s
    * distributed rank, `false` → [[dictionary]]'s one-task merge. */
  val ScalableDictionariesConf = "spark.graft.scalableDictionaries"

  /** [[dictionary]] / [[dictionaryScalable]] dispatch: an explicit
    * `scalable` wins; otherwise [[ScalableDictionariesConf]] decides
    * (default TRUE — the exposed dictionary builds should run the path
    * that survives a high-cardinality column, and for bounded dims the
    * extra range exchange costs ~0.2 s, not correctness). Both paths are
    * row-identical (spec-asserted and both oracled); plan-internal callers
    * that broadcast a provably tiny dim pin `Some(false)` for the cheaper
    * merge task. */
  def dictionaryAuto(df: DataFrame, column: String, idName: String,
      nameName: String, scalable: Option[Boolean] = None): DataFrame = {
    val useScalable = scalable.getOrElse(
      df.sparkSession.conf.get(ScalableDictionariesConf, "true").toBoolean)
    if (useScalable) dictionaryScalable(df, column, idName, nameName)
    else dictionary(df, column, idName, nameName)
  }

  /** P5 (`MapReduceJobBase.getKeyDate`/`formatKey`): normalize a timestamp to
    * the reference's `yyyy/MM/dd` sort-stable string key. */
  def dateNormalize(events: DataFrame): DataFrame =
    events
      .select(col("event_id"), date_format(col("ts"), "yyyy/MM/dd").as("d"))
      .orderBy("event_id")

  /** A3 + A6 composed: the OLAP-prep job's full output — daily counts keyed by
    * dictionary ids rather than names (SanFranciscoCrimePrepOlap.java:161-205).
    * The reference probes driver-local static HashMaps (single-JVM-only);
    * here the dictionaries are tiny DataFrames broadcast-joined in, which is
    * the same hash probe but correct on a real cluster.
    */
  def dailyCubeIndexed(events: DataFrame): DataFrame = {
    val cube = dailyCube(events)
    // dictionaries from their own single-column scans, NOT from the cube:
    // deriving them from the aggregate looks cheaper (no second scan) but
    // each dictionary branch prunes the aggregate differently, so Spark
    // cannot reuse one exchange across the three branches and the whole
    // scan+shuffle runs three times (measured +0.7 s on this query at
    // sf0.1). A one-column pruned scan + distinct is the cheap path in any
    // columnar format — it reads only that column's bytes.
    val catDict = dictionary(events, "event_type", "category_id", "event_type")
    val distDict = dictionary(
      events.select(districtOf(col("user_id")).as("district")), "district",
      "district_id", "district")
    cube
      .join(broadcast(catDict), "event_type")
      .join(broadcast(distDict), "district")
      .select(
        date_format(col("d"), "yyyy/MM/dd").as("d"),
        (col("category_id") - 1).as("cat_idx"),
        (col("district_id") - 1).as("dist_idx"),
        col("n"))
      .orderBy("d", "cat_idx", "dist_idx")
  }
}
