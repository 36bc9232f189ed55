package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.6 / BASELINE north star).
  *
  * Media are modeled the way a 100 TB training pipeline stores them: an
  * opaque `binary` payload column plus typed metadata columns, decoded
  * per-partition in batches. Two decode tiers coexist:
  *
  *   - REAL codecs, pure-JVM: PNG (full zlib IDAT inflate + all five PNG
  *     row filters reconstructed — see `decodePixelStats` below) and WAV
  *     (RIFF header walk + PCM16 mono/stereo sample decode). These cover
  *     the formats the synthetic corpus actually ships.
  *   - `decodeStub`, a clearly-marked deterministic fake for the synthetic
  *     `fake/raw` format — it stands in for codecs this container can't
  *     ship (JPEG/video); swap it for a real one (e.g. javacv) without
  *     touching the plan shape.
  */
object Multimodal {

  /** Wrap documents as media blobs: payload = UTF-8 bytes of the text (the
    * stand-in for image bytes), with source/format metadata. NULL-text rows
    * are dropped — a blob row always carries an actual payload (the Dedup
    * discipline; a null would otherwise NPE inside the batch decoders). */
  def asBlobTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"),
      lit("fake/raw").as("format"))
      .where(col("payload").isNotNull)

  /** Pure-column metadata extraction — the byte length; the cheap
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
  def sampleFrames(spark: SparkSession, documents: DataFrame, everyN: Int = 2): DataFrame = {
    // pmod(_, 0) is DIVIDE_BY_ZERO under ANSI (and a silent drop-everything
    // NULL without it) — fail at build time like imageNearDup does
    require(everyN >= 1, s"sampleFrames: everyN must be >= 1, got $everyN")
    decodeFeatures(spark, documents)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .where(pmod(col("frame_idx"), lit(everyN)) === 0)
      .orderBy("media_id", "frame_idx")
  }

  // ---- real container formats: structural header decode (no codec) --------
  //
  // The stub above fakes pixel decode; these ops are NOT stubs. They build
  // real PNG / WAV containers (valid signatures, chunk layout, CRCs) and
  // parse them back the way a header-only probe (`ffprobe`, `file`,
  // PIL.Image.open without load) does: verify the magic, WALK the chunk
  // list, read the big/little-endian structure fields. Dimensions therefore
  // come from actual byte structure — the oracle only has to predict the
  // planted values, not re-run a codec. Pure JDK (java.util.zip.CRC32).

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** One PNG chunk: length, type, data, CRC32 over type+data — the single
    * builder shared by [[pngBytes]] and [[pngBytesWithPixels]]. */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val t = typ.getBytes("US-ASCII")
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** The single PNG chunk walk shared by [[parsePng]] and [[decodePixels]]:
    * signature check, then per chunk a BOUNDS check (a truncated file or a
    * corrupted length field must raise the contract's IllegalArgumentException,
    * not index past the buffer), CRC verify, and the callback with
    * (type, data offset, data length). Returns the chunk count. */
  private def walkPngChunks(id: Long, b: Array[Byte])(
      onChunk: (String, Int, Int) => Unit): Int = {
    require(b.length >= 8 && PngSig.indices.forall(i => b(i) == PngSig(i)),
      s"media $id: not a PNG (bad signature)")
    var off = 8
    var chunks = 0
    while (off < b.length) {
      require(off + 8 <= b.length,
        s"media $id: truncated chunk header at offset $off")
      val len = readBe32(b, off)
      require(len >= 0 && off.toLong + 12 + len <= b.length,
        s"media $id: corrupt chunk length $len at offset $off")
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, off + 4, 4 + len)
      require(crc.getValue.toInt == readBe32(b, off + 8 + len),
        s"media $id: CRC mismatch in $typ")
      onChunk(typ, off + 8, len)
      chunks += 1
      off += 12 + len
    }
    chunks
  }

  /** A minimal but REAL PNG: signature, IHDR with true CRC32, IEND. */
  private[graft] def pngBytes(width: Int, height: Int): Array[Byte] = {
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, 6, 0, 0, 0) // depth 8, RGBA, deflate, std filter, no interlace
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IEND", Array.emptyByteArray)
  }

  /** A REAL RIFF/WAVE container: fmt chunk (PCM16) + zero-filled data. */
  private[graft] def wavBytes(sampleRate: Int, channels: Int,
      nSamples: Int): Array[Byte] = {
    val dataSize = nSamples * channels * 2
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataSize) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * channels * 2) ++ le16(channels * 2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(dataSize) ++ new Array[Byte](dataSize)
  }

  case class PngHeader(media_id: Long, n_bytes: Int, width: Int, height: Int,
      bit_depth: Int, color_type: Int, n_chunks: Int)

  /** Structural PNG parse: signature check, then a chunk WALK (length/type/
    * data/CRC), verifying each CRC and reading IHDR's big-endian fields —
    * not fixed offsets into trusted bytes. */
  private[graft] def parsePng(id: Long, b: Array[Byte]): PngHeader = {
    var width, height, depth, color = -1
    val chunks = walkPngChunks(id, b) { (typ, dataOff, len) =>
      if (typ == "IHDR") {
        require(len >= 13, s"media $id: IHDR chunk too short ($len bytes)")
        width = readBe32(b, dataOff)
        height = readBe32(b, dataOff + 4)
        depth = b(dataOff + 8).toInt
        color = b(dataOff + 9).toInt
      }
    }
    require(width >= 0, s"media $id: no IHDR chunk")
    PngHeader(id, b.length, width, height, depth, color, chunks)
  }

  case class WavHeader(media_id: Long, n_bytes: Int, sample_rate: Int,
      channels: Int, bits_per_sample: Int, n_samples: Int)

  /** The single RIFF sub-chunk walk shared by [[parseWav]] and
    * [[wavPcmLayout]]: magic check, then per chunk a BOUNDS check on the
    * untrusted little-endian length field — a negative length would
    * otherwise make the loop increment zero (executor hang, the failure
    * class round 6 hardened out of the PNG path) and an oversized one
    * would index past the buffer. Callback gets (type, data offset, len).
    * RIFF pads odd-length chunks with one byte the length field does NOT
    * count — skipping it keeps the walk aligned on externally produced
    * files (our own chunks are all even-sized). */
  private def walkRiffChunks(id: Long, b: Array[Byte])(
      onChunk: (String, Int, Int) => Unit): Unit = {
    require(b.length >= 12
        && new String(b, 0, 4, "US-ASCII") == "RIFF"
        && new String(b, 8, 4, "US-ASCII") == "WAVE",
      s"media $id: not a RIFF/WAVE container")
    var off = 12
    while (off + 8 <= b.length) {
      val typ = new String(b, off, 4, "US-ASCII")
      val len = readLe32(b, off + 4)
      require(len >= 0 && off.toLong + 8 + len <= b.length,
        s"media $id: corrupt chunk length $len at offset $off")
      onChunk(typ, off + 8, len)
      off += 8 + len + (len & 1)
    }
  }

  /** Structural WAV parse: RIFF/WAVE magic, then a little-endian sub-chunk
    * walk; n_samples derives from the data chunk's true size. */
  private[graft] def parseWav(id: Long, b: Array[Byte]): WavHeader = {
    var rate, ch, bits, dataSize = -1
    walkRiffChunks(id, b) { (typ, dataOff, len) =>
      if (typ == "fmt ") {
        require(len >= 16, s"media $id: fmt chunk too short ($len bytes)")
        ch = readLe16(b, dataOff + 2)
        rate = readLe32(b, dataOff + 4)
        bits = readLe16(b, dataOff + 14)
      } else if (typ == "data") dataSize = len
    }
    require(rate >= 0 && dataSize >= 0, s"media $id: missing fmt/data chunk")
    // loud failure on a degenerate fmt chunk, not an ArithmeticException
    // out of the division below — bits must be a positive multiple of 8
    // (bits = 4, a real ADPCM value, would floor ch*bits/8 to zero)
    require(ch > 0 && bits > 0 && bits % 8 == 0,
      s"media $id: fmt declares $ch channels x $bits bits")
    WavHeader(id, b.length, rate, ch, bits, dataSize / (ch * bits / 8))
  }

  // ---- real pixel decode: IDAT inflate + filter reconstruction ------------
  //
  // The one step decodeStub could not do honestly without media libraries is
  // done here with the JDK alone: PNG's pixel payload is zlib-deflated
  // scanlines behind per-row filters — java.util.zip.{Deflater, Inflater}
  // plus ~40 lines of the spec'd filter math (PNG spec §4.5.4, filters
  // None/Sub/Up/Average/Paeth) decode it exactly. Pixels are planted by a
  // deterministic integer formula, so the DuckDB oracle predicts the exact
  // channel sums WITHOUT running a codec — any error in deflate framing,
  // chunk CRCs, or filter reconstruction breaks the hash match.

  /** Planted channel value for pixel (x, y) channel c of image `id` —
    * integer math both engines reproduce (mirrored in the mm_pixel_stats
    * oracle SQL). */
  private[graft] def plantedPixel(id: Long, x: Int, y: Int, c: Int): Int =
    (((id + 1) * 31 + x * 7 + y * 13 + c * 5) % 256).toInt

  /** Planted dims for the pixel fixtures: 1..4 on each axis, cycling with
    * doc_id so all filter/width edge cases (incl. 1-px rows where the
    * `left` predecessor is always 0) occur in the corpus. */
  private[graft] def plantedDims(id: Long): (Int, Int) = {
    val j = id / 2
    (1 + (j % 4).toInt, 1 + (j * 3 % 4).toInt)
  }

  /** A COMPLETE PNG with real pixels: RGBA8, one IDAT holding the
    * zlib-deflated scanlines, each scanline filtered with type y % 5 — so
    * every decode exercises all five PNG filters, not just None. */
  private[graft] def pngBytesWithPixels(id: Long, width: Int, height: Int): Array[Byte] = {
    val bpp = 4
    val stride = width * bpp
    val raw = Array.tabulate(height, stride)((y, i) =>
      plantedPixel(id, i / bpp, y, i % bpp).toByte)
    val filtered = new java.io.ByteArrayOutputStream()
    for (y <- 0 until height) {
      val ft = y % 5
      filtered.write(ft)
      for (i <- 0 until stride) {
        val cur = raw(y)(i) & 0xff
        val a = if (i >= bpp) raw(y)(i - bpp) & 0xff else 0
        val b = if (y > 0) raw(y - 1)(i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) raw(y - 1)(i - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        filtered.write((cur - pred) & 0xff)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray)
    deflater.finish()
    val buf = new Array[Byte](8192)
    val idat = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = be32(width) ++ be32(height) ++ Array[Byte](8, 6, 0, 0, 0)
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", idat.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** PNG spec §4.5.4 Paeth predictor. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  case class PixelStats(media_id: Long, width: Int, height: Int,
      n_pixels: Int, sum_r: Long, sum_g: Long, sum_b: Long, sum_a: Long)

  /** Decoded RGBA rows (height × width·4 ints 0..255) — the shared product
    * of the real decode path, consumed by [[decodePixelStats]] and
    * [[aHash64]]. */
  private def decodePixels(id: Long, bytes: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
    var width, height = -1
    val idat = new java.io.ByteArrayOutputStream()
    walkPngChunks(id, bytes) { (typ, dataOff, len) =>
      if (typ == "IHDR") {
        require(len >= 13, s"media $id: IHDR chunk too short ($len bytes)")
        width = readBe32(bytes, dataOff)
        height = readBe32(bytes, dataOff + 4)
        require(bytes(dataOff + 8) == 8 && bytes(dataOff + 9) == 6
            && bytes(dataOff + 12) == 0,
          s"media $id: decoder supports RGBA8 non-interlaced only")
      } else if (typ == "IDAT") idat.write(bytes, dataOff, len)
    }
    require(width > 0 && idat.size() > 0, s"media $id: missing IHDR/IDAT")
    val bpp = 4
    val stride = width * bpp
    val expected = height * (1 + stride)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val lines = new Array[Byte](expected)
    var got = 0
    var stalled = false
    while (!inflater.finished() && got < expected && !stalled) {
      val n = inflater.inflate(lines, got, expected - got)
      got += n
      // inflate()==0 while unfinished means it wants input we don't have
      // (truncated stream) — bail to the loud require instead of spinning
      if (n == 0) stalled = true
    }
    inflater.end()
    require(got == expected,
      s"media $id: IDAT inflated to $got bytes, expected $expected")
    val out = Array.ofDim[Int](height, stride)
    for (y <- 0 until height) {
      val ft = lines(y * (1 + stride)) & 0xff
      require(ft <= 4, s"media $id: unknown filter type $ft on row $y")
      for (i <- 0 until stride) {
        val x = lines(y * (1 + stride) + 1 + i) & 0xff
        val a = if (i >= bpp) out(y)(i - bpp) else 0
        val b = if (y > 0) out(y - 1)(i) else 0
        val c = if (y > 0 && i >= bpp) out(y - 1)(i - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        out(y)(i) = (x + pred) & 0xff
      }
    }
    (width, height, out)
  }

  /** REAL pixel decode: chunk walk (CRC-verified), IDAT concatenation,
    * zlib inflate, per-scanline filter reconstruction — then exact integer
    * channel sums over the reconstructed pixels. RGBA8 non-interlaced only
    * (what the fixtures are — the honest JDK-only envelope; depth/color
    * combinations beyond it fail loudly rather than mis-decode). */
  private[graft] def decodePixelStats(id: Long, bytes: Array[Byte]): PixelStats = {
    val (width, height, out) = decodePixels(id, bytes)
    var sr, sg, sb, sa = 0L
    for (y <- 0 until height; px <- 0 until width) {
      sr += out(y)(px * 4)
      sg += out(y)(px * 4 + 1)
      sb += out(y)(px * 4 + 2)
      sa += out(y)(px * 4 + 3)
    }
    PixelStats(id, width, height, width * height, sr, sg, sb, sa)
  }

  case class AHash(media_id: Long, width: Int, height: Int,
      ahash_hi: Long, ahash_lo: Long)

  /** Average perceptual hash (the classic aHash image near-dup primitive)
    * over REAL decoded pixels: nearest-neighbor resample to 8×8 (integer
    * index map `src = dst·dim div 8` — no interpolation float path), gray
    * as the r+g+b sum (division-free, scale-invariant for the compare),
    * bit i set iff `gray_i · 64 > Σgray` (strict; ties → 0 — integer-exact
    * in any engine). The 64 bits split into two non-negative 32-bit halves
    * so the oracle never touches the sign bit. Near-dup candidates are then
    * hamming-bucketed exactly like [[graft.ops.Dedup.simhashNearDup]]. */
  private[graft] def aHash64(id: Long, bytes: Array[Byte]): AHash = {
    val (width, height, px) = decodePixels(id, bytes)
    val gray = new Array[Long](64)
    var tot = 0L
    for (yd <- 0 until 8; xd <- 0 until 8) {
      val xs = xd * width / 8
      val ys = yd * height / 8
      val g = px(ys)(xs * 4).toLong + px(ys)(xs * 4 + 1) + px(ys)(xs * 4 + 2)
      gray(yd * 8 + xd) = g
      tot += g
    }
    var hi = 0L
    var lo = 0L
    for (i <- 0 until 64) {
      if (gray(i) * 64 > tot) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
    }
    AHash(id, width, height, hi, lo)
  }

  /** Perceptual-hash table over the pixel-bearing PNG corpus — the image
    * half of multimodal dedup: decode (REAL), hash, and downstream hamming
    * join, with the hash values oracled bit-for-bit from the planted-pixel
    * formula. */
  /** The decode → aHash table, unordered — shared by [[imageAHashes]] and
    * [[imageNearDup]] so the hash pipeline has one definition. */
  private def aHashTable(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    pngPixelBlobs(spark, documents).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => aHash64(id, payload) })
      .toDF()
  }

  def imageAHashes(spark: SparkSession, documents: DataFrame): DataFrame =
    aHashTable(spark, documents).orderBy("media_id")

  /** Image near-dup pairs over the REAL-decoded aHash table — the pigeonhole
    * pattern of [[graft.ops.Dedup.simhashNearDup]] applied to the image
    * modality: a 64-bit hash splits into four 16-bit chunks, and any pair
    * within `maxHamming` ≤ 3 differing bits must agree on at least one whole
    * chunk, so candidate pairs are generated ONLY inside equal-chunk buckets
    * (never an O(n²) cross join; buckets above [[Dedup.MaxBucket]] are the
    * same observable skew cap as the text path). Hashes travel inside the
    * bucket list, so the hamming verify is in-bucket column math — the
    * decoded pixels are never revisited. */
  def imageNearDup(spark: SparkSession, documents: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    require(maxHamming >= 0 && maxHamming <= 3,
      s"imageNearDup: 4-chunk pigeonhole only guarantees recall for " +
        s"maxHamming <= 3, got $maxHamming")
    val hashes = aHashTable(spark, documents)
    val chunks = hashes
      .withColumn("chunk_idx", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk",
        when(col("chunk_idx") < 2,
          call_function("shiftright", col("ahash_lo"), col("chunk_idx") * 16))
          .otherwise(call_function("shiftright", col("ahash_hi"),
            (col("chunk_idx") - 2) * 16))
          .bitwiseAND(lit(0xFFFFL)))
    val buckets = chunks.groupBy("chunk_idx", "chunk")
      .agg(collect_list(struct(col("media_id"), col("ahash_hi"),
        col("ahash_lo"))).as("ids"))
      .where(size(col("ids")).between(2, Dedup.MaxBucket))
    Dedup.bucketPairs(buckets, "ids", dedupeContent = true)
      .select(col("a.media_id").as("doc_a"), col("b.media_id").as("doc_b"),
        (graft.functions.GraftFunctions.hamming64(
            col("a.ahash_hi"), col("b.ahash_hi"))
          + graft.functions.GraftFunctions.hamming64(
            col("a.ahash_lo"), col("b.ahash_lo"))).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Even-doc_id documents as COMPLETE pixel-bearing PNGs (planted dims and
    * planted pixel values — tiny 1×1..4×4 images, the honest scope of a
    * codec-less container). */
  def pngPixelBlobs(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    Spread.toCores(documents.select(col("doc_id"))
        .where(col("doc_id") % 2 === 0))
      .as[Long]
      .mapPartitions(_.map { id =>
        val (w, h) = plantedDims(id)
        (id, pngBytesWithPixels(id, w, h))
      })
      .toDF("media_id", "payload")
  }

  /** True pixel statistics from a REAL decode (inflate + filter math) —
    * the oracle predicts the sums from the planted formula, so a hash
    * match proves the whole container → deflate → filter → pixel path. */
  def pixelStats(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    pngPixelBlobs(spark, documents).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodePixelStats(id, payload) })
      .toDF()
      .orderBy("media_id")
  }

  /** Even-doc_id documents as real PNG blobs with planted dimensions
    * (the deterministic stand-in for an actual image corpus). */
  def pngBlobs(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    // Spread first (the sibling blob generators' discipline): blob build +
    // the CRC walk downstream are CPU-bound, and a small local scan is one
    // partition
    Spread.toCores(documents.select(col("doc_id"))
        .where(col("doc_id") % 2 === 0))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, pngBytes(16 + (id * 7 % 1024).toInt, 16 + (id * 13 % 1024).toInt))
      })
      .toDF("media_id", "payload")
  }

  /** Odd-doc_id documents as real WAV blobs with planted audio params. */
  def wavBlobs(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    Spread.toCores(documents.select(col("doc_id"))
        .where(col("doc_id") % 2 === 1))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, wavBytes(8000 + (id % 8).toInt * 1000, 1 + (id / 2 % 2).toInt,
          100 + (id * 37 % 900).toInt))
      })
      .toDF("media_id", "payload")
  }

  // ---- real audio: planted PCM samples, decoded from the data chunk -------

  /** Planted 16-bit sample k of medium `id` — integer math the oracle
    * replays (mirrored in the mm_wav_stats SQL). */
  private[graft] def plantedSample(id: Long, k: Int): Int =
    ((((id + 1) * 31 + k * 7) % 65536) - 32768).toInt

  /** A RIFF/WAVE with REAL PCM: 16-bit little-endian planted samples in the
    * data chunk — the audio analog of [[pngBytesWithPixels]]. `nSamples`
    * counts TOTAL interleaved samples (frames × channels); sample k is
    * planted by the same formula regardless of channel count, so the oracle
    * replays stereo by assigning channel = k mod 2. */
  private[graft] def wavBytesWithSamples(id: Long, sampleRate: Int,
      nSamples: Int, channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && nSamples % channels == 0,
      s"media $id: $nSamples samples not divisible into $channels channels")
    val data = new Array[Byte](nSamples * 2)
    for (k <- 0 until nSamples) {
      val s = plantedSample(id, k)
      data(2 * k) = (s & 0xff).toByte
      data(2 * k + 1) = ((s >> 8) & 0xff).toByte
    }
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * 2 * channels) ++ le16(2 * channels) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  case class WavStats(media_id: Long, n_samples: Int, peak_abs: Int,
      sum_abs: Long, first_sample: Int)

  /** RIFF walk (with pad bytes) to the PCM layout: (channels, bits,
    * data offset, data length) — shared by the mono and per-channel
    * decoders. */
  private def wavPcmLayout(id: Long, b: Array[Byte]): (Int, Int, Int, Int) = {
    var ch, bits, dataOff, dataLen = -1
    walkRiffChunks(id, b) { (typ, chunkOff, len) =>
      if (typ == "fmt ") {
        require(len >= 16, s"media $id: fmt chunk too short ($len bytes)")
        ch = readLe16(b, chunkOff + 2)
        bits = readLe16(b, chunkOff + 14)
      } else if (typ == "data") { dataOff = chunkOff; dataLen = len }
    }
    require(dataOff >= 0, s"media $id: missing data chunk")
    (ch, bits, dataOff, dataLen)
  }

  /** REAL sample decode: RIFF walk, then 16-bit LE PCM from the data
    * chunk — exact integer amplitude statistics (peak and L1 energy), the
    * pre-filter an audio pipeline runs before paying for resample/features.
    * Mono 16-bit only; see [[decodeWavChannelStats]] for stereo. */
  private[graft] def decodeWavStats(id: Long, b: Array[Byte]): WavStats = {
    val (ch, bits, dataOff, dataLen) = wavPcmLayout(id, b)
    require(ch == 1 && bits == 16,
      s"media $id: sample decoder supports mono 16-bit only, got $ch ch x $bits")
    val n = dataLen / 2
    var peak = 0
    var sumAbs = 0L
    var first = 0
    for (k <- 0 until n) {
      // int16 LE, sign-extended
      val v = ((b(dataOff + 2 * k) & 0xff) |
        (b(dataOff + 2 * k + 1).toInt << 8)).toShort.toInt
      if (k == 0) first = v
      val a = math.abs(v)
      if (a > peak) peak = a
      sumAbs += a
    }
    WavStats(id, n, peak, sumAbs, first)
  }

  case class WavChannelStats(media_id: Long, channel: Int, n_samples: Int,
      peak_abs: Int, sum_abs: Long, first_sample: Int)

  /** Per-channel amplitude statistics for mono OR stereo 16-bit PCM —
    * interleaved frames de-multiplexed by sample index mod channels. One
    * output row per channel; a mono file yields a single channel-0 row
    * matching [[decodeWavStats]]. More than two channels fails loudly
    * (the honest scope of the fixtures). */
  private[graft] def decodeWavChannelStats(id: Long,
      b: Array[Byte]): Seq[WavChannelStats] = {
    val (ch, bits, dataOff, dataLen) = wavPcmLayout(id, b)
    require((ch == 1 || ch == 2) && bits == 16,
      s"media $id: channel decoder supports 1-2 ch 16-bit, got $ch ch x $bits")
    val n = dataLen / 2
    require(n % ch == 0, s"media $id: $n samples not divisible by $ch channels")
    val peak = new Array[Int](ch)
    val sumAbs = new Array[Long](ch)
    val first = new Array[Int](ch)
    for (k <- 0 until n) {
      val c = k % ch
      val v = ((b(dataOff + 2 * k) & 0xff) |
        (b(dataOff + 2 * k + 1).toInt << 8)).toShort.toInt
      if (k == c) first(c) = v
      val a = math.abs(v)
      if (a > peak(c)) peak(c) = a
      sumAbs(c) += a
    }
    (0 until ch).map(c => WavChannelStats(id, c, n / ch, peak(c), sumAbs(c),
      first(c)))
  }

  /** Odd-doc_id documents as REAL-PCM WAV blobs (planted samples). */
  def wavPcmBlobs(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    Spread.toCores(documents.select(col("doc_id"))
        .where(col("doc_id") % 2 === 1))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, wavBytesWithSamples(id, 16000, 64 + (id % 256).toInt))
      })
      .toDF("media_id", "payload")
  }

  /** True amplitude statistics from a REAL PCM decode — the oracle predicts
    * peak/L1 from the planted-sample formula, proving the container →
    * little-endian-int16 → amplitude path end to end. */
  def wavSampleStats(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    wavPcmBlobs(spark, documents).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeWavStats(id, payload) })
      .toDF()
      .orderBy("media_id")
  }

  /** Odd-doc_id documents as STEREO REAL-PCM WAV blobs: the same planted
    * frame count per channel as the mono fixtures, interleaved L/R. */
  def wavStereoBlobs(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    Spread.toCores(documents.select(col("doc_id"))
        .where(col("doc_id") % 2 === 1))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, wavBytesWithSamples(id, 16000, 2 * (64 + (id % 256).toInt),
          channels = 2))
      })
      .toDF("media_id", "payload")
  }

  /** Per-channel amplitude statistics over stereo PCM — interleaved frames
    * de-multiplexed in one pass, two rows per medium. The oracle replays
    * the planted-sample formula with channel = sample index mod 2. */
  def wavStereoStats(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    wavStereoBlobs(spark, documents).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeWavChannelStats(id, payload)
      })
      .toDF()
      .orderBy("media_id", "channel")
  }

  /** Structural header decode over the PNG blob table — same partition-
    * batched shape as [[decodeFeatures]], but the parse is REAL. */
  def pngHeaders(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    pngBlobs(spark, documents).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => parsePng(id, payload) })
      .toDF()
      .orderBy("media_id")
  }

  /** Structural header decode over the WAV blob table. */
  def wavHeaders(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    wavBlobs(spark, documents).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => parseWav(id, payload) })
      .toDF()
      .orderBy("media_id")
  }

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
