package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface beyond the parquet tables (SURVEY §2.1).
  *
  * The reference's sinks are Hadoop TSV part files (S4) and a row-at-a-time
  * MySQL JDBC loader with truncate-before-load (S5/S6,
  * `LoadStarDB.java:86-103, 202-217`). Engine equivalents are columnar,
  * partitioned writes; `Overwrite` subsumes the truncate step, and
  * `write.jdbc` batches + parameterizes what the reference string-built per
  * row (SQL injection by design there — `LoadStarDB.java:301-346`).
  */
object Sinks {

  /** S4: TSV part files (`key TAB value...`), sorted for golden stability. */
  def writeTsv(df: DataFrame, path: String, coalesce: Int = 0): Unit = {
    val out = if (coalesce > 0) df.coalesce(coalesce) else df
    out.write.mode("overwrite").option("sep", "\t").option("header", "false").csv(path)
  }

  /** S3: the `DataFile.extractKeys` analog — read MR-style TSV part files,
    * keep column 0, distinct + sorted (the reference sorts at
    * `DataFile.java:55`). Explicit 1-column schema, not inference: PERMISSIVE
    * CSV keeps the first field and ignores the rest, so this skips the
    * whole-file inference pre-scan AND stays well-defined on an empty sink
    * dir (inference over zero data files finds no columns at all). */
  def readTsvKeys(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "key", org.apache.spark.sql.types.StringType))))
      .csv(path)
      .where(col("key").isNotNull)
      .distinct()
      .orderBy("key")

  /** Engine-native sink: partitioned parquet (Overwrite = S6 truncate). */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed table write: pre-partitions (and optionally pre-sorts) the
    * data by join key so repeated fact-fact joins on that key plan WITHOUT a
    * shuffle exchange — the storage-level co-location strategy for the
    * 100 TB fact tables (SortMergeJoin reads co-bucketed files directly;
    * verified shuffle-free in SinksSpec). */
  def writeBucketed(df: DataFrame, table: String, bucketColumn: String,
      numBuckets: Int, sortColumn: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketColumn)
    sortColumn.map(w.sortBy(_)).getOrElse(w).saveAsTable(table)
  }

  /** S5+S6: JDBC star-schema load, the `LoadStarDB` replacement. Overwrite
    * with `truncate=true` preserves the target DDL like the reference's
    * `truncate table`; `batchsize` replaces its autocommit row-at-a-time
    * inserts. Exercised end-to-end against embedded Derby in `SinksSpec`
    * (write + read-back + truncate semantics); parameters mirror
    * `LoadStarDB.main` (host/db/user/pass). */
  def writeJdbc(df: DataFrame, url: String, table: String, user: String,
      password: String, batchSize: Int = 10000): Unit = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    df.write.mode("overwrite")
      .option("truncate", "true")
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)
  }
}
