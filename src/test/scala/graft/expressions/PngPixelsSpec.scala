package graft.expressions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal

class PngPixelsSpec extends SparkSpec {
  import spark.implicits._

  // ---- hand-rolled PNG writer: real deflate, chosen filters, real CRCs ----

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
  }

  /** Apply PNG filter `ft` to row `y` of `pixels` (true bytes, row-major,
    * `ch` channels) — the encoder side of the recurrence the kernel must
    * invert.
    */
  private def filterRow(
      pixels: Array[Byte], w: Int, ch: Int, y: Int, ft: Int): Array[Byte] = {
    val rb = w * ch
    val out = new Array[Byte](rb)
    var x = 0
    while (x < rb) {
      val cur = pixels(y * rb + x) & 0xff
      val a = if (x >= ch) pixels(y * rb + x - ch) & 0xff else 0
      val b = if (y > 0) pixels((y - 1) * rb + x) & 0xff else 0
      val c = if (x >= ch && y > 0) pixels((y - 1) * rb + x - ch) & 0xff else 0
      val pred = ft match {
        case 0 => 0
        case 1 => a
        case 2 => b
        case 3 => (a + b) >> 1
        case 4 =>
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b)
          val pc = math.abs(p - c)
          if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      out(x) = (cur - pred).toByte
      x += 1
    }
    out
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Build a complete PNG from true pixel bytes, filtering row y with
    * `filters(y % filters.length)`, deflate-compressing, and splitting
    * the stream across `idatSplits` IDAT chunks.
    */
  private def makePng(
      w: Int, h: Int, colorType: Int, pixels: Array[Byte],
      filters: Seq[Int] = Seq(0), idatSplits: Int = 1,
      corruptAdler: Boolean = false): Array[Byte] = {
    val ch = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(colorType)
    require(pixels.length == w * h * ch)
    val raw = new ByteArrayOutputStream()
    for (y <- 0 until h) {
      val ft = filters(y % filters.length)
      raw.write(ft)
      raw.write(filterRow(pixels, w, ch, y, ft))
    }
    val z = deflate(raw.toByteArray)
    if (corruptAdler) z(z.length - 1) = (z(z.length - 1) ^ 0x01).toByte
    val sig = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    val splits = math.max(1, math.min(idatSplits, z.length))
    val per = math.max(1, z.length / splits)
    val idats = z.grouped(per).map(chunk("IDAT", _)).reduce(_ ++ _)
    sig ++ chunk("IHDR", ihdr) ++ idats ++ chunk("IEND", Array.empty)
  }

  private def pix(w: Int, h: Int, ch: Int)(f: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      out((y * w + x) * ch + c) = f(x, y, c).toByte
    out
  }

  private def decode(png: Array[Byte], maxPixels: Int = 1 << 22): Array[Byte] =
    PngCodec.unfilteredPixels(png, maxPixels)

  // ---- every filter type inverts, including first-row/first-col edges ----

  test("each filter type 0-4 reconstructs exactly (RGB 7x4, adversarial pixels)") {
    val p = pix(7, 4, 3)((x, y, c) => (x * 37 + y * 111 + c * 73 + 13) % 256)
    for (ft <- 0 to 4) {
      val png = makePng(7, 4, 2, p, filters = Seq(ft))
      assert(decode(png).toSeq === p.toSeq, s"filter $ft")
    }
    // all five mixed across rows
    val mixed = makePng(7, 4, 2, p, filters = Seq(4, 1, 0, 3, 2))
    assert(decode(mixed).toSeq === p.toSeq, "mixed filters")
  }

  test("all color types decode; 1-wide and 1-tall edges; multi-IDAT split") {
    for ((ct, ch) <- Seq((0, 1), (2, 3), (4, 2), (6, 4))) {
      val p = pix(5, 3, ch)((x, y, c) => (x * 41 + y * 29 + c * 97) % 256)
      val png = makePng(5, 3, ct, p, filters = Seq(1, 4, 3))
      assert(decode(png).toSeq === p.toSeq, s"color type $ct")
    }
    val tall = pix(1, 9, 3)((x, y, c) => (y * 50 + c * 9) % 256)
    assert(decode(makePng(1, 9, 2, tall, filters = Seq(4))).toSeq === tall.toSeq)
    val wide = pix(9, 1, 3)((x, y, c) => (x * 50 + c * 9) % 256)
    assert(decode(makePng(9, 1, 2, wide, filters = Seq(3))).toSeq === wide.toSeq)
    val p = pix(16, 16, 3)((x, y, c) => (x * y + c) % 256)
    val split = makePng(16, 16, 2, p, filters = Seq(2), idatSplits = 5)
    assert(decode(split).toSeq === p.toSeq, "IDAT split across 5 chunks")
  }

  test("ImageIO ground truth: the JDK encoder's real filter choices invert") {
    def viaImageIo(w: Int, h: Int, imgType: Int): (Array[Byte], BufferedImage) = {
      val img = new BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 2654435761L + y * 40503L + 0xabcdef).toInt)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", bos))
      (bos.toByteArray, img)
    }
    val (rgbPng, rgbImg) = viaImageIo(23, 17, BufferedImage.TYPE_INT_RGB)
    val gotRgb = decode(rgbPng)
    assert(gotRgb != null && gotRgb.length === 23 * 17 * 3)
    for (y <- 0 until 17; x <- 0 until 23) {
      val argb = rgbImg.getRGB(x, y)
      val base = (y * 23 + x) * 3
      assert((gotRgb(base) & 0xff) === ((argb >> 16) & 0xff), s"R($x,$y)")
      assert((gotRgb(base + 1) & 0xff) === ((argb >> 8) & 0xff), s"G($x,$y)")
      assert((gotRgb(base + 2) & 0xff) === (argb & 0xff), s"B($x,$y)")
    }
    val (argbPng, argbImg) = viaImageIo(9, 31, BufferedImage.TYPE_INT_ARGB)
    val gotArgb = decode(argbPng)
    assert(gotArgb != null && gotArgb.length === 9 * 31 * 4)
    for (y <- 0 until 31; x <- 0 until 9) {
      val argb = argbImg.getRGB(x, y)
      val base = (y * 9 + x) * 4
      assert((gotArgb(base) & 0xff) === ((argb >> 16) & 0xff))
      assert((gotArgb(base + 3) & 0xff) === ((argb >>> 24) & 0xff), "alpha")
    }
    val (grayPng, grayImg) = viaImageIo(13, 13, BufferedImage.TYPE_BYTE_GRAY)
    val gotGray = decode(grayPng)
    assert(gotGray != null && gotGray.length === 13 * 13)
    for (y <- 0 until 13; x <- 0 until 13)
      assert((gotGray(y * 13 + x) & 0xff) ===
        grayImg.getRaster.getSample(x, y, 0), s"gray($x,$y)")
  }

  test("Adam7 interlaced PNGs decode: the JDK progressive encoder round-trips") {
    import javax.imageio.{IIOImage, ImageWriteParam}
    import javax.imageio.stream.MemoryCacheImageOutputStream
    def progressive(w: Int, h: Int, imgType: Int): (Array[Byte], BufferedImage) = {
      val img = new BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 2654435761L + y * 40503L + 0x123456).toInt)
      val writer = ImageIO.getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT) // Adam7
      val bos = new ByteArrayOutputStream()
      val mos = new MemoryCacheImageOutputStream(bos)
      writer.setOutput(mos)
      writer.write(null, new IIOImage(img, null, null), param)
      mos.close(); writer.dispose()
      val bytes = bos.toByteArray
      assert((bytes(8 + 8 + 12) & 0xff) === 1, "interlace flag actually set")
      (bytes, img)
    }
    // dims chosen so several passes are non-trivial AND several are
    // empty-in-one-dimension (w or h below a pass's start offset)
    for ((w, h) <- Seq((23, 17), (8, 8), (5, 3), (1, 1), (2, 9))) {
      val (png, img) = progressive(w, h, BufferedImage.TYPE_INT_RGB)
      val got = decode(png)
      assert(got != null, s"progressive ${w}x$h decodes")
      assert(got.length === w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val base = (y * w + x) * 3
        assert((got(base) & 0xff) === ((argb >> 16) & 0xff), s"R($x,$y) ${w}x$h")
        assert((got(base + 1) & 0xff) === ((argb >> 8) & 0xff), s"G($x,$y) ${w}x$h")
        assert((got(base + 2) & 0xff) === (argb & 0xff), s"B($x,$y) ${w}x$h")
      }
    }
    // gray + alpha-carrying types through the interlaced path too
    val (gp, gi) = progressive(9, 6, BufferedImage.TYPE_BYTE_GRAY)
    val gotG = decode(gp)
    assert(gotG != null && gotG.length === 9 * 6)
    for (y <- 0 until 6; x <- 0 until 9)
      assert((gotG(y * 9 + x) & 0xff) === gi.getRaster.getSample(x, y, 0))
    val (ap, ai) = progressive(7, 5, BufferedImage.TYPE_INT_ARGB)
    val gotA = decode(ap)
    assert(gotA != null && gotA.length === 7 * 5 * 4)
    for (y <- 0 until 5; x <- 0 until 7) {
      val argb = ai.getRGB(x, y)
      val base = (y * 7 + x) * 4
      assert((gotA(base) & 0xff) === ((argb >> 16) & 0xff))
      assert((gotA(base + 3) & 0xff) === ((argb >>> 24) & 0xff), "alpha")
    }
  }

  test("malformed payloads fail as NULL, never crash") {
    val p = pix(4, 4, 3)((x, y, c) => (x + y + c) % 256)
    val good = makePng(4, 4, 2, p, filters = Seq(1))
    assert(decode(good) != null)
    // adler flipped: zlib integrity check must actually run
    assert(decode(makePng(4, 4, 2, p, corruptAdler = true)) == null)
    // truncated IDAT
    assert(decode(good.dropRight(20)) == null)
    // undefined filter type 5
    val badFt = {
      val raw = new ByteArrayOutputStream()
      for (y <- 0 until 4) { raw.write(5); raw.write(filterRow(p, 4, 3, y, 0)) }
      val sig = good.take(8)
      val ihdr = be32(4) ++ be32(4) ++ Array[Byte](8, 2, 0, 0, 0)
      sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflate(raw.toByteArray)) ++
        chunk("IEND", Array.empty)
    }
    assert(decode(badFt) == null)
    // interlaced / palette / 16-bit / bad signature / oversized
    def mutate(i: Int, v: Byte): Array[Byte] = {
      val c = good.clone(); c(i) = v; c }
    // interlace=1 over SEQUENTIAL scanline data: the Adam7 pass layout
    // expects a different byte total, so the exact-size inflate rejects
    assert(decode(mutate(8 + 8 + 12, 1)) == null, "interlace flag on sequential data")
    assert(decode(mutate(8 + 8 + 12, 2)) == null, "undefined interlace mode")
    assert(decode(mutate(8 + 8 + 9, 3)) == null, "palette color type")
    assert(decode(mutate(8 + 8 + 8, 16)) == null, "16-bit depth")
    assert(decode(mutate(0, 0x47)) == null, "bad signature")
    assert(decode(good, maxPixels = 15) == null, "pixel cap")
    assert(decode(Array.empty[Byte]) == null)
    // deflate stream longer than the scanlines claim (extra row appended)
    val overlong = {
      val raw = new ByteArrayOutputStream()
      for (y <- 0 until 4) { raw.write(0); raw.write(filterRow(p, 4, 3, y, 0)) }
      raw.write(new Array[Byte](13)) // one extra scanline's worth
      val sig = good.take(8)
      val ihdr = be32(4) ++ be32(4) ++ Array[Byte](8, 2, 0, 0, 0)
      sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflate(raw.toByteArray)) ++
        chunk("IEND", Array.empty)
    }
    assert(decode(overlong) == null)
  }

  test("ZlibInflate: round-trip, cap enforcement, trailing garbage rejected") {
    val rnd = new scala.util.Random(42)
    val data = Array.fill(10000)(rnd.nextInt(7).toByte) // compressible
    val z = {
      val d = new Deflater(); d.setInput(data); d.finish()
      val buf = new Array[Byte](20000)
      val n = d.deflate(buf); d.end(); buf.take(n)
    }
    assert(PngCodec.inflateZlib(z, 10000).toSeq === data.toSeq)
    assert(PngCodec.inflateZlib(z, 20000).toSeq === data.toSeq, "loose cap ok")
    assert(PngCodec.inflateZlib(z, 9999) == null, "cap exceeded")
    assert(PngCodec.inflateZlib(z ++ Array[Byte](1, 2), 10000) == null,
      "trailing input")
    assert(PngCodec.inflateZlib(z.dropRight(3), 10000) == null, "truncated")
    val zc = z.clone(); zc(zc.length - 1) = (zc(zc.length - 1) ^ 1).toByte
    assert(PngCodec.inflateZlib(zc, 10000) == null, "adler flip")
  }

  test("expression: codegen and interpreted eval agree; null propagates") {
    val p = pix(6, 5, 3)((x, y, c) => (x * 31 + y * 17 + c * 5) % 256)
    val png = makePng(6, 5, 2, p, filters = Seq(4, 2))
    val rows = Seq((1L, png), (2L, png.dropRight(25)), (3L, null))
    val df = rows.toDF("id", "payload")
      .select(col("id"), Multimodal.decodePngPixels(col("payload")).as("px"))
    val got = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))).toMap
    assert(got(1L).toSeq === p.toSeq)
    assert(got(2L) == null && got(3L) == null)
    // interpreted path: direct expression eval on a literal
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val interp = PngUnfilteredPixels(Literal(png, BinaryType), 1 << 22)
      .eval(null).asInstanceOf[Array[Byte]]
    assert(interp.toSeq === p.toSeq, "interpreted == codegen")
    assert(PngUnfilteredPixels(
      Literal(png.dropRight(25), BinaryType), 1 << 22).eval(null) == null)
  }

  test("pngPixelStats: exact channel stats per color type; blank cut; NULL channels") {
    val rgb = pix(3, 2, 3)((x, y, c) => c match {
      case 0 => 10 * x + 1; case 1 => 20 * y + 2; case _ => x + y })
    val gray = pix(4, 3, 1)((x, y, _) => 7) // constant → blank
    val rows = Seq(
      (1L, makePng(3, 2, 2, rgb, filters = Seq(1, 3))),
      (2L, makePng(4, 3, 0, gray, filters = Seq(2))))
    val m = rows.toDF("id", "payload")
      .select(col("id"), Multimodal.pngPixelStats(col("payload")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val p1 = m(1L)
    val rVals = for (y <- 0 until 2; x <- 0 until 3) yield 10 * x + 1
    val gVals = for (y <- 0 until 2; x <- 0 until 3) yield 20 * y + 2
    assert(p1.getAs[Long]("n_pixels") === 6L)
    assert(p1.getAs[Int]("channels") === 3)
    assert(p1.getAs[Double]("c0_mean") === rVals.sum.toDouble / 6)
    assert(p1.getAs[Int]("c0_min") === rVals.min)
    assert(p1.getAs[Int]("c0_max") === rVals.max)
    assert(p1.getAs[Double]("c1_mean") === gVals.sum.toDouble / 6)
    assert(p1.isNullAt(p1.fieldIndex("c3_mean")), "no alpha channel → NULL")
    assert(!p1.getAs[Boolean]("is_blank"))
    val p2 = m(2L)
    assert(p2.getAs[Int]("channels") === 1)
    assert(p2.getAs[Double]("c0_mean") === 7.0)
    assert(p2.isNullAt(p2.fieldIndex("c1_mean")))
    assert(p2.getAs[Boolean]("is_blank"))
  }

  test("pngAHash: gray image hashes identically as grayscale PNG and 24-bpp BMP") {
    def lum(x: Int, y: Int): Int = (x * 23 + y * 51) % 256
    val w = 19; val h = 11
    val grayPng = makePng(w, h, 0,
      pix(w, h, 1)((x, y, _) => lum(x, y)), filters = Seq(4, 0, 1))
    val rgbPng = makePng(w, h, 2,
      pix(w, h, 3)((x, y, _) => lum(x, y)), filters = Seq(3, 2))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, lum(x, y) * 0x010101)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "bmp", bos))
    val bmpBytes = bos.toByteArray
    val r = Seq((grayPng, rgbPng, bmpBytes)).toDF("g", "rgb", "bmp")
      .select(
        Multimodal.pngAHash(col("g")).as("hg"),
        Multimodal.pngAHash(col("rgb")).as("hrgb"),
        Multimodal.bmpAHash(col("bmp")).as("hbmp"))
      .head()
    assert(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
    assert(r.getLong(0) === r.getLong(2),
      "gray PNG == BMP of the same image (luma scale matches)")
    assert(r.getLong(1) === r.getLong(2),
      "RGB PNG == BMP of the same image")
    // a genuinely different image lands far away
    val other = makePng(w, h, 0,
      pix(w, h, 1)((x, y, _) => ((x / 4 + y / 4) % 2) * 255), filters = Seq(0))
    val hOther = Seq(Tuple1(other)).toDF("p")
      .select(Multimodal.pngAHash(col("p"))).head().getLong(0)
    assert(java.lang.Long.bitCount(r.getLong(0) ^ hOther) > 8)
  }
}
