package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Hostile-bytes behavior of the container parsers — the classes a round-10
  * review found crashing with bare AIOOBE, dividing by zero, or (worst)
  * looping forever instead of the contract's loud IllegalArgumentException.
  * At 100 TB a corrupt blob is routine; an executor hang on one is a page. */
class MediaCorruptionSpec extends AnyFunSuite {
  import TestSpark.spark

  test("PNG: truncated mid-chunk raises IllegalArgumentException, not AIOOBE") {
    val good = Multimodal.pngBytes(16, 16)
    // cut after the IHDR length+type, before its data/CRC
    val truncated = good.take(8 + 8)
    val e = intercept[IllegalArgumentException](Multimodal.parsePng(1L, truncated))
    assert(e.getMessage.contains("corrupt") || e.getMessage.contains("truncated"))
    // a crafted huge length field must not index past the buffer either
    val hugeLen = good.clone()
    hugeLen(8) = 0x7f.toByte // IHDR length becomes ~2^31
    val e2 = intercept[IllegalArgumentException](Multimodal.parsePng(2L, hugeLen))
    assert(e2.getMessage.contains("corrupt"))
  }

  test("WAV: negative chunk length fails loudly instead of hanging the walk") {
    val good = Multimodal.wavBytes(8000, 1, 10)
    val evil = good.clone()
    // fmt chunk length at offset 16..19 -> 0xFFFFFFF8 (-8): the old walk's
    // `off += 8 + len + (len & 1)` added zero and spun forever
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    val e = intercept[IllegalArgumentException](Multimodal.parseWav(1L, evil))
    assert(e.getMessage.contains("corrupt"))
    // oversized length: would read past the buffer
    val big = good.clone()
    big(19) = 0x7f.toByte
    intercept[IllegalArgumentException](Multimodal.parseWav(2L, big))
  }

  test("WAV: sub-byte bits_per_sample fails loudly, not ArithmeticException") {
    // bits = 4 (IMA ADPCM) passed the old `bits > 0` guard and then
    // ch * bits / 8 = 0 divided by zero
    val good = Multimodal.wavBytes(8000, 1, 10)
    val adpcm = good.clone()
    adpcm(34) = 4 // bits_per_sample LE16 at offset 34
    val e = intercept[IllegalArgumentException](Multimodal.parseWav(1L, adpcm))
    assert(e.getMessage.contains("bits"))
  }

  test("decodeFeatures: null-text documents are dropped, not NPE'd") {
    import spark.implicits._
    val docs = Seq(
      (1L, Option("hello world"), "s1"),
      (2L, Option.empty[String], "s1"),
      (3L, Option("more text"), "s2"))
      .toDF("doc_id", "text", "source")
    val out = Multimodal.decodeFeatures(spark, docs)
      .select("media_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L), s"expected null-text row dropped, got $out")
  }

  test("sampleFrames rejects everyN < 1 at build time") {
    import spark.implicits._
    val docs = Seq((1L, "x", "s")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException](Multimodal.sampleFrames(spark, docs, 0))
  }
}
