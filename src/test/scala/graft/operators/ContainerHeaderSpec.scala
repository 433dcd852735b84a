package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-built known-answer coverage for the WebP and FLAC header
  * decoders (no JDK encoder exists for either format, so the byte
  * layouts are constructed from the specs directly — the same layouts
  * the oracle gates build in-plan, plus edge cases the gate corpora
  * cannot reach).
  */
class ContainerHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le24(v: Int) =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
  private def le32(v: Long) = (0 to 3).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def riff(fourcc: String, body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32(body.length + 8L) ++
      "WEBP".getBytes("US-ASCII") ++ fourcc.getBytes("US-ASCII") ++
      le32(body.length.toLong) ++ body

  private def decodeWebp(bytes: Array[Byte]) =
    Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.decodeWebpMeta(col("p")).as("m"))
      .select("m.width", "m.height", "m.format").collect()(0)

  test("WebP VP8 lossy: scale bits masked, sync code enforced") {
    val body = Array[Byte](0, 0, 0) ++ // frame tag
      Array(0x9d.toByte, 0x01.toByte, 0x2a.toByte) ++
      le16(16383 | (3 << 14)) ++ le16(2 | (1 << 14)) // max dims + scale bits
    val r = decodeWebp(riff("VP8 ", body))
    assert(r.getInt(0) === 16383 && r.getInt(1) === 2 && r.getString(2) === "lossy")
    val badSync = body.clone(); badSync(5) = 0x2b
    val n = Seq(Tuple1(riff("VP8 ", badSync))).toDF("p")
      .select(Multimodal.decodeWebpMeta(col("p"))).collect()(0)
    assert(n.isNullAt(0), "wrong sync code → NULL")
  }

  test("WebP VP8L: 14-bit packed dims at both extremes") {
    def vp8l(w: Int, h: Int): Array[Byte] = {
      val b1 = ((w - 1) & 0xff).toByte
      val b2 = ((((w - 1) >> 8) & 0x3f) | (((h - 1) & 0x3) << 6)).toByte
      val b3 = (((h - 1) >> 2) & 0xff).toByte
      val b4 = (((h - 1) >> 10) & 0x0f).toByte
      riff("VP8L", Array(0x2f.toByte, b1, b2, b3, b4))
    }
    val a = decodeWebp(vp8l(1, 1))
    assert(a.getInt(0) === 1 && a.getInt(1) === 1 && a.getString(2) === "lossless")
    val b = decodeWebp(vp8l(16384, 16384)) // the full 14-bit range
    assert(b.getInt(0) === 16384 && b.getInt(1) === 16384)
    val badSig = Seq(Tuple1(riff("VP8L", Array(0x30.toByte, 0, 0, 0, 0))))
      .toDF("p").select(Multimodal.decodeWebpMeta(col("p"))).collect()(0)
    assert(badSig.isNullAt(0), "wrong VP8L signature byte → NULL")
  }

  test("WebP VP8X: 24-bit canvas dims past the 14-bit limit") {
    val body = Array[Byte](0, 0, 0, 0) ++ le24(100000 - 1) ++ le24(70000 - 1)
    val r = decodeWebp(riff("VP8X", body))
    assert(r.getInt(0) === 100000 && r.getInt(1) === 70000 &&
      r.getString(2) === "extended")
    // a RIFF container that is not WebP
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(100) ++ "WAVE".getBytes("US-ASCII")
    assert(Seq(Tuple1(wav ++ body)).toDF("p")
      .select(Multimodal.decodeWebpMeta(col("p"))).collect()(0).isNullAt(0))
  }

  private def flac(
      rate: Int, channels: Int, bps: Int, total: Long,
      blockType: Int = 0, last: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write((if (last) 0x80 else 0x00) | blockType)
    out.write(0); out.write(0); out.write(34)
    out.write(Array[Byte](0x10, 0x00, 0x10, 0x00)) // min/max block
    out.write(new Array[Byte](6))                  // min/max frame
    out.write((rate >> 12) & 0xff)
    out.write((rate >> 4) & 0xff)
    out.write(((rate & 0xf) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4))
    out.write((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf).toInt)
    out.write(((total >> 24) & 0xff).toInt); out.write(((total >> 16) & 0xff).toInt)
    out.write(((total >> 8) & 0xff).toInt); out.write((total & 0xff).toInt)
    out.write(new Array[Byte](16)) // md5
    out.toByteArray
  }

  test("FLAC STREAMINFO: bit boundaries, 36-bit totals, exact duration") {
    def dec(b: Array[Byte]) = Seq(Tuple1(b)).toDF("p")
      .select(Multimodal.decodeFlacMeta(col("p")).as("m"))
      .select("m.sample_rate", "m.channels", "m.bits_per_sample",
        "m.total_samples", "m.duration_us").collect()(0)
    // the classic CD profile
    val cd = dec(flac(44100, 2, 16, 44100L * 3600))
    assert(cd.getInt(0) === 44100 && cd.getInt(1) === 2 && cd.getInt(2) === 16)
    assert(cd.getLong(4) === 3600000000L, "exactly one hour")
    // 36-bit total (> 2^32) at the max 20-bit rate, 8ch/32bps extremes
    val big = dec(flac(655350, 8, 32, (1L << 35) + 12345))
    assert(big.getInt(0) === 655350 && big.getInt(1) === 8 && big.getInt(2) === 32)
    assert(big.getLong(3) === (1L << 35) + 12345)
    // exact floored duration: total*1e6 div rate, no decimal rounding
    val t = (1L << 35) + 12345
    assert(big.getLong(4) === t * 1000000L / 655350L)
    // duration where the naive decimal path would round up: fraction
    // within 5e-7 of 1 at a 2e6+ "rate" is impossible (20-bit field),
    // but an adversarial near-integer quotient still must floor
    val f = dec(flac(3, 1, 8, 2)) // 2/3 s = 666666.66... µs
    assert(f.getLong(4) === 666666L, "floors, never rounds")
    // negatives: PADDING-first, bad magic, zero rate, truncation
    assert(Seq(Tuple1(flac(44100, 2, 16, 10, blockType = 1))).toDF("p")
      .select(Multimodal.decodeFlacMeta(col("p"))).collect()(0).isNullAt(0))
    val badMagic = flac(44100, 2, 16, 10); badMagic(0) = 'g'
    assert(Seq(Tuple1(badMagic)).toDF("p")
      .select(Multimodal.decodeFlacMeta(col("p"))).collect()(0).isNullAt(0))
    assert(Seq(Tuple1(flac(0, 2, 16, 10))).toDF("p")
      .select(Multimodal.decodeFlacMeta(col("p"))).collect()(0).isNullAt(0))
    assert(Seq(Tuple1(flac(44100, 2, 16, 10).take(30))).toDF("p")
      .select(Multimodal.decodeFlacMeta(col("p"))).collect()(0).isNullAt(0))
  }
}
