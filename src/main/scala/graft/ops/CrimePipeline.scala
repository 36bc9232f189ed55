package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, StringType}
import graft.functions.GraftFunctions._

/** The reference pipeline itself, end to end, on crime-shaped CSV
  * (SURVEY.md §3): `SanFranciscoCrime` (weekly per-key histograms) and
  * `SanFranciscoCrimePrepOlap` (daily sparse triplets with dictionary ids),
  * re-expressed as three declarative queries over one CSV scan.
  *
  * Semantics intentionally preserved from the reference:
  *   - positional 12-column schema, all strings
  *     (`MapReduceJobBase.java:40-55`);
  *   - quoted fields with embedded commas (opencsv at `DataFile.java:65-70`
  *     → Spark's CSV reader with quote handling);
  *   - header + malformed rows dropped, not nulled
  *     (`SanFranciscoCrime.java:79-99` → header option + explicit filters;
  *     `try_to_date` nulls unparseable dates, then filtered — the engine's
  *     ANSI-safe analog of the reference's catch-ParseException-and-skip);
  *   - week buckets `Calendar.MONTH * 5 + WEEK_OF_MONTH`, dense 0..16
  *     (bucket 16 = the week-6 aliasing edge the reference half-handles,
  *     SURVEY §2.3-A2 — emitted explicitly here);
  *   - dictionary ids = 0-based sorted rank (`DataFile.java:55`);
  *   - output sorted by key, dense CSV vector / sparse triplet shapes
  *     matching `part-00000`.
  */
object CrimePipeline {

  /** Positional schema of the SF OpenData incident CSV. */
  val schema: StructType = StructType(Seq(
    "IncidntNum", "Category", "Descript", "DayOfWeek", "Date", "Time",
    "PdDistrict", "Resolution", "Address", "X", "Y", "Location")
    .map(StructField(_, StringType, nullable = true)))

  /** S1+S2+P3: CSV scan with quote handling and header dropped, every data
    * row tagged with a `bad_reason` column — null for clean rows, else the
    * first failing validity rule. The reference LOGS each dropped malformed
    * row (`SanFranciscoCrime.java:91-99`) rather than silently skipping;
    * this is the columnar side channel for that: one scan serves both the
    * clean pipeline ([[readCrimeCsv]]) and the dropped-row audit
    * ([[badRecords]]) — at scale the audit is a filter over the same
    * pruned scan, not a second parse. */
  def readCrimeCsvTagged(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .schema(schema)
      .csv(path)
      .withColumn("incident_date",
        try_to_date(split(col("Date"), " ").getItem(0), "MM/dd/yyyy"))
      .withColumn("bad_reason",
        when(col("Category").isNull, "missing_category")
          .when(col("PdDistrict").isNull, "missing_district")
          .when(col("incident_date").isNull, "bad_date"))

  /** P4: the clean rows (malformed dropped, as the reference's
    * catch-ParseException-and-skip path does). */
  def readCrimeCsv(spark: SparkSession, path: String): DataFrame =
    readCrimeCsvTagged(spark, path)
      .where(col("bad_reason").isNull).drop("bad_reason")

  /** P4 side output: the dropped rows with their reason — the engine's
    * badRecordsPath-style accounting for the reference's per-row skip log.
    */
  def badRecords(spark: SparkSession, path: String): DataFrame =
    readCrimeCsvTagged(spark, path)
      .where(col("bad_reason").isNotNull).drop("incident_date")

  /** A2 / `ReduceByWeek`: dense weekly histogram per key column over buckets
    * 0..16 (reference pre-zeroes 0..15 and leaks 16 on 6-week months).
    * Output: (key, c0..c16) sorted by key — the `part-00000` row shape. */
  def weeklyCounts(crime: DataFrame, keyColumn: String): DataFrame = {
    val buckets = 0 to 16
    crime
      .select(col(keyColumn).as("key"),
        month_week_bucket(col("incident_date")).as("b"))
      .groupBy("key")
      .pivot("b", buckets)
      .count()
      .na.fill(0L)
      .toDF("key" +: buckets.map(b => s"c$b"): _*)
      .orderBy("key")
  }

  /** A6 / `DataFile.extractKeys`: 0-based sorted-rank dictionary of a key
    * column — the id space job 2 and `LoadStarDB` share. */
  def dictionary0(crime: DataFrame, keyColumn: String): DataFrame =
    Parity.dictionary(crime, keyColumn, "id1", "name")
      .select((col("id1") - 1).as("idx"), col("name"))

  /** A3 / `SanFranciscoCrimePrepOlap`: sparse daily (catIdx, distIdx, count)
    * triplets keyed by normalized `yyyy/MM/dd` date string, ids joined from
    * the dictionaries (broadcast — the reference's static-HashMap side input
    * made cluster-safe). */
  def dailyTriplets(crime: DataFrame): DataFrame = {
    val cats = dictionary0(crime, "Category")
      .withColumnRenamed("idx", "cat_idx").withColumnRenamed("name", "Category")
    val dists = dictionary0(crime, "PdDistrict")
      .withColumnRenamed("idx", "dist_idx").withColumnRenamed("name", "PdDistrict")
    crime
      .groupBy(
        date_format(col("incident_date"), "yyyy/MM/dd").as("d"),
        col("Category"), col("PdDistrict"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(cats), "Category")
      .join(broadcast(dists), "PdDistrict")
      .select(col("d"), col("cat_idx"), col("dist_idx"), col("n"))
      .orderBy("d", "cat_idx", "dist_idx")
  }

  /** S4: the reference's TSV sink shape — `key TAB v1,v2,...` text rows. */
  def toTsv(df: DataFrame, keyColumn: String): DataFrame = {
    val valueCols = df.columns.toIndexedSeq.filterNot(_ == keyColumn).map(col)
    df.select(concat_ws("\t", col(keyColumn), concat_ws(",", valueCols: _*)).as("line"))
  }

  /** Whole job-1 + job-2 run to TSV files, mirroring `runmapreduce.sh`:
    * one cached scan feeds all three outputs (the reference re-scans the CSV
    * per job). */
  def runAll(spark: SparkSession, csvPath: String, outDir: String): Unit = {
    val tagged = readCrimeCsvTagged(spark, csvPath).cache()
    try {
      val crime = tagged.where(col("bad_reason").isNull).drop("bad_reason")
      toTsv(weeklyCounts(crime, "Category"), "key")
        .coalesce(1).write.mode("overwrite").text(s"$outDir/bycategory")
      toTsv(weeklyCounts(crime, "PdDistrict"), "key")
        .coalesce(1).write.mode("overwrite").text(s"$outDir/bydistrict")
      toTsv(dailyTriplets(crime).withColumn("triplet",
          concat_ws(",", col("cat_idx"), col("dist_idx"), col("n")))
          .select("d", "triplet"), "d")
        .coalesce(1).write.mode("overwrite").text(s"$outDir/star")
      // dropped-row audit (the reference logs every skipped malformed row)
      tagged.where(col("bad_reason").isNotNull)
        .select(col("IncidntNum"), col("bad_reason"))
        .coalesce(1).write.mode("overwrite").option("sep", "\t")
        .csv(s"$outDir/badrecords")
    } finally tagged.unpersist()
  }
}
