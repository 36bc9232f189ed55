package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.6 / BASELINE north star).
  *
  * Media are modeled the way a 100 TB training pipeline stores them: an
  * opaque `binary` payload column plus typed metadata columns, decoded
  * per-partition in batches. The Spark-side plumbing — schema, partition
  * batching, output shape — is real; the actual image/audio codec is STUBBED
  * (this container ships no media libraries) behind `decodeStub`, a
  * deterministic fake that derives "decoded" properties from the payload
  * bytes. Swap `decodeStub` for a real codec (e.g. javacv) without touching
  * the plan shape.
  */
object Multimodal {

  /** Wrap documents as media blobs: payload = UTF-8 bytes of the text (the
    * stand-in for image bytes), with source/format metadata. */
  def asBlobTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"),
      lit("fake/raw").as("format"))

  /** Pure-column metadata extraction — byte length and a checksum; the cheap
    * pre-filter a pipeline runs BEFORE paying for decode. Fully codegen'd. */
  def blobMeta(documents: DataFrame): DataFrame =
    asBlobTable(documents)
      .select(
        col("media_id"),
        octet_length(col("payload")).as("n_bytes"),
        col("source"), col("format"))
      .orderBy("media_id")

  /** Output row of the (stubbed) decoder. */
  case class DecodedMedia(media_id: Long, n_bytes: Int, width: Int,
      height: Int, n_frames: Int, feature: Array[Double])

  /** STUB decoder: stands in for `imageio.decode(payload)`. Deterministic
    * fake properties derived from payload bytes; a real implementation would
    * decode pixels and run the feature extractor here, amortizing model/codec
    * init across the partition's batch (why this is mapPartitions, not a
    * per-row UDF).
    *
    * The fake is two polynomial residues over the payload bytes — plain
    * integer arithmetic (every step < 2^39), so the DuckDB oracle re-derives
    * the exact "decoded" properties from the same bytes and the whole
    * multimodal pipeline is hash-verified end to end despite the codec being
    * a stand-in. (Oracle folds character codes, so it matches for ASCII
    * payloads — which the synthetic corpus is; a real codec replaces all of
    * this anyway.) */
  private def decodeStub(mediaId: Long, payload: Array[Byte]): DecodedMedia = {
    var h1 = 0L
    var h2 = 0L
    payload.foreach { b =>
      val c = b & 0xff
      h1 = (h1 * 31 + c) % 2147483647L
      h2 = (h2 * 131 + c) % 2147483629L
    }
    val width = 64 + (h1 % 512).toInt
    val height = 64 + (h2 % 512).toInt
    val frames = 1 + ((h1 + h2) % 8).toInt
    val feature =
      Array.tabulate(8)(i => ((h1 * (i + 1) + h2 * (i + 7)) % 1000) / 1000.0)
    DecodedMedia(mediaId, payload.length, width, height, frames, feature)
  }

  /** Batch decode + feature extraction over the blob table: per-partition
    * iterator processing (the Scala analog of mapInPandas batch UDFs) via the
    * typed Dataset API — codec init happens once per partition, not per row.
    * The feature vector is flattened to scalar columns f0..f7 at the output
    * boundary: array-typed output crashes the driver's pandas comparator
    * (round-1 lesson); downstream consumers wanting the vector re-assemble
    * with `array(f0..f7)`. */
  def decodeFeatures(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    asBlobTable(documents)
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // real impl: open codec / load feature model here, once per batch
        iter.map { case (id, payload) => decodeStub(id, payload) }
      }
      .toDF()
      .select(Seq(col("media_id"), col("n_bytes"), col("width"), col("height"),
        col("n_frames")) ++
        (0 until 8).map(i => element_at(col("feature"), i + 1).as(s"f$i")): _*)
      .orderBy("media_id")
  }

  /** Frame sampling over decoded media: one row per kept frame, every
    * `everyN`-th of each medium's `n_frames` (a video pipeline's
    * sample-before-decode-the-rest step). Pure column ops on the decoded
    * metadata — the expensive per-frame decode would hang off these rows. */
  def sampleFrames(spark: SparkSession, documents: DataFrame, everyN: Int = 2): DataFrame =
    decodeFeatures(spark, documents)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .where(pmod(col("frame_idx"), lit(everyN)) === 0)
      .orderBy("media_id", "frame_idx")

  /** Resize planning: target-width scaled dimensions preserving aspect ratio
    * (rounded half-up — `floor(x + 0.5)`, spelled out because engines split
    * on round-half ties: Spark HALF_UP vs DuckDB HALF_EVEN), the metadata
    * half of an image-resize stage. */
  def resizePlan(spark: SparkSession, documents: DataFrame, targetWidth: Int = 224): DataFrame =
    decodeFeatures(spark, documents)
      .select(col("media_id"), col("width"), col("height"),
        lit(targetWidth).as("out_width"),
        floor(col("height") * lit(targetWidth) / col("width") + lit(0.5))
          .cast("int").as("out_height"))
      .orderBy("media_id")
}
