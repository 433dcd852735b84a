package graft.expressions

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GifPixelsSpec extends SparkSpec {
  import spark.implicits._

  // ---- hand-rolled GIF writer: clear-heavy BYTE-ALIGNED LZW coding ----
  // mcs=7 → code width 8; CLEAR (0x80) before every literal keeps the
  // dictionary from ever growing, so each code is exactly one byte — a
  // degenerate-but-legal stream (the stored-deflate analog for GIF).

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def gifClearHeavy(
      w: Int, h: Int, palette: Int => (Int, Int, Int), idx: (Int, Int) => Int,
      interlaced: Boolean = false, corruptSig: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((if (corruptSig) "GIX89a" else "GIF89a").getBytes("US-ASCII"))
    out.write(le16(w)); out.write(le16(h))
    out.write(0x86) // GCT present, 2^7 = 128 entries
    out.write(0); out.write(0)
    for (i <- 0 until 128) {
      val (r, g, b) = palette(i); out.write(r); out.write(g); out.write(b)
    }
    out.write(0x2c)
    out.write(le16(0)); out.write(le16(0)); out.write(le16(w)); out.write(le16(h))
    out.write(if (interlaced) 0x40 else 0x00)
    out.write(7) // min code size
    // storage row order: interlaced pass order or plain top-down
    val rows =
      if (!interlaced) 0 until h
      else Seq(0 -> 8, 4 -> 8, 2 -> 4, 1 -> 2).flatMap {
        case (s, st) => s until h by st }
    val codes = new ByteArrayOutputStream()
    for (y <- rows; x <- 0 until w) {
      codes.write(0x80) // CLEAR
      codes.write(idx(x, y))
    }
    codes.write(0x81) // EOI
    codes.toByteArray.grouped(255).foreach { blk =>
      out.write(blk.length); out.write(blk)
    }
    out.write(0) // sub-block terminator
    out.write(0x3b)
    out.toByteArray
  }

  private def pal(i: Int): (Int, Int, Int) = ((2 * i) % 256, (3 * i) % 256, 255 - i)

  private def decode(g: Array[Byte], maxPixels: Int = 1 << 22): Array[Byte] =
    GifCodec.framePixels(g, maxPixels)

  test("clear-heavy stream decodes exactly; interlaced variant deinterlaces") {
    val w = 9; val h = 11
    def idx(x: Int, y: Int): Int = (x * 13 + y * 7) % 128
    val expected = (for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) yield {
      val (r, g, b) = pal(idx(x, y)); Seq(r, g, b)(c).toByte
    }).toArray
    assert(decode(gifClearHeavy(w, h, pal, idx)).toSeq === expected.toSeq)
    assert(decode(gifClearHeavy(w, h, pal, idx, interlaced = true)).toSeq ===
      expected.toSeq, "interlaced rows reorder to the same image")
  }

  test("ImageIO ground truth: the JDK encoder's REAL growing-dictionary LZW decodes") {
    // indexed image with an explicit small palette — encoder output is
    // exact (no quantization); comparison is on RGB values via getRGB
    val n = 64
    val r = (0 until n).map(i => ((i * 5) % 256).toByte).toArray
    val g = (0 until n).map(i => ((i * 11) % 256).toByte).toArray
    val b = (0 until n).map(i => ((i * 29) % 256).toByte).toArray
    val icm = new IndexColorModel(8, n, r, g, b)
    val w = 37; val h = 23
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * x + 3 * y + (x * y) % 7) % n)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", bos), "JDK GIF writer available")
    val got = decode(bos.toByteArray)
    assert(got != null, "real LZW stream must decode")
    assert(got.length === w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert((got(base) & 0xff) === ((argb >> 16) & 0xff), s"R($x,$y)")
      assert((got(base + 1) & 0xff) === ((argb >> 8) & 0xff), s"G($x,$y)")
      assert((got(base + 2) & 0xff) === (argb & 0xff), s"B($x,$y)")
    }
    // a second, larger image with long runs — exercises KwKwK + width growth
    val img2 = new BufferedImage(120, 80, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 80; x <- 0 until 120)
      img2.getRaster.setSample(x, y, 0, if ((x / 17 + y / 13) % 2 == 0) 3 else 40)
    val bos2 = new ByteArrayOutputStream()
    assert(ImageIO.write(img2, "gif", bos2))
    val got2 = decode(bos2.toByteArray)
    assert(got2 != null && got2.length === 120 * 80 * 3)
    for (y <- 0 until 80 by 7; x <- 0 until 120 by 11) {
      val argb = img2.getRGB(x, y)
      val base = (y * 120 + x) * 3
      assert((got2(base) & 0xff) === ((argb >> 16) & 0xff), s"R($x,$y) run image")
    }
  }

  test("malformed payloads fail as NULL, never crash") {
    def idx(x: Int, y: Int): Int = (x + y) % 128
    val good = gifClearHeavy(5, 4, pal, idx)
    assert(decode(good) != null)
    assert(decode(gifClearHeavy(5, 4, pal, idx, corruptSig = true)) == null)
    assert(decode(good.dropRight(12)) == null, "truncated stream")
    assert(decode(good, maxPixels = 19) == null, "pixel cap")
    assert(decode(Array.empty[Byte]) == null)
    // palette bound: an index >= 128 entries must be rejected
    val overIdx = gifClearHeavy(3, 3, pal, (_, _) => 127)
    assert(decode(overIdx) != null)
    // patch one literal byte to 200 (> palette size) — literals are
    // byte-aligned in the clear-heavy coding so this is surgical
    val patched = overIdx.clone()
    val firstLiteral = patched.indexOfSlice(Seq(0x80.toByte, 127.toByte))
    patched(firstLiteral + 1) = 200.toByte
    assert(decode(patched) == null, "index outside color table")
    // no color table at all
    val noGct = {
      val out = new ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      out.write(le16(2)); out.write(le16(2))
      out.write(0x00); out.write(0); out.write(0) // no GCT
      out.write(0x2c)
      out.write(le16(0)); out.write(le16(0)); out.write(le16(2)); out.write(le16(2))
      out.write(0x00)
      out.write(7); out.write(2); out.write(0x80); out.write(1); out.write(0)
      out.write(0x3b)
      out.toByteArray
    }
    assert(decode(noGct) == null)
  }

  test("expression: codegen path on a frame; null propagates") {
    def idx(x: Int, y: Int): Int = (x * 3 + y) % 128
    val good = gifClearHeavy(6, 3, pal, idx)
    val expected = (for (y <- 0 until 3; x <- 0 until 6; c <- 0 until 3) yield {
      val (r, g, b) = pal(idx(x, y)); Seq(r, g, b)(c).toByte
    }).toArray
    val rows = Seq((1L, good), (2L, good.dropRight(9)), (3L, null))
    val got = rows.toDF("id", "payload")
      .select(col("id"),
        org.apache.spark.sql.graft.bridge.column(GifFramePixels(
          org.apache.spark.sql.graft.bridge.expression(col("payload")),
          1 << 22)).as("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))).toMap
    assert(got(1L).toSeq === expected.toSeq)
    assert(got(2L) == null && got(3L) == null)
    // interpreted parity
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val interp = GifFramePixels(Literal(good, BinaryType), 1 << 22)
      .eval(null).asInstanceOf[Array[Byte]]
    assert(interp.toSeq === expected.toSeq)
  }
}
