package graft.expressions

import java.io.ByteArrayOutputStream

import scala.collection.mutable.ArrayBuffer

import graft.SparkSpec

/** Ground truth for [[JpegCodec]]: a self-contained baseline encoder
  * (ITU-T T.81 Annex K quant/Huffman tables, bit-level writer with byte
  * stuffing and restart markers) encodes KNOWN quantized coefficients;
  * expected pixels come from an INDEPENDENT direct-form 2-D IDCT (the
  * kernel uses the separable form), replicated upsampling, and the same
  * documented rounding — so a parse/Huffman/bit-reader/IDCT bug anywhere
  * breaks equality. Real-encoder interop runs against javax.imageio with
  * a small tolerance (libjpeg's integer IDCT and fancy upsampler differ
  * legitimately by a couple of code values).
  */
class JpegPixelsSpec extends SparkSpec {

  // ---- T.81 Annex K.1 quantization tables (natural order) -------------
  private val ZZ = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val lumaQzz = Array(
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101, 103, 99)
  private val chromaQzz = Array(
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)
  private def natural(zz: Array[Int]): Array[Int] = {
    val q = new Array[Int](64)
    for (i <- 0 until 64) q(ZZ(i)) = zz(i)
    q
  }
  private val lumaQ = natural(lumaQzz)
  private val chromaQ = natural(chromaQzz)

  // ---- Annex K.3 Huffman table specs ----------------------------------
  private val dcLumaCounts =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcLumaSyms = (0 to 11).map(_.toByte).toArray
  private val dcChromaCounts =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val dcChromaSyms = (0 to 11).map(_.toByte).toArray
  private val acLumaCounts =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val acLumaSyms = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA).map(_.toByte)
  private val acChromaCounts =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val acChromaSyms = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA).map(_.toByte)

  private def canonicalCodes(
      counts: Array[Int], syms: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (l <- 1 to 16) {
      for (_ <- 0 until counts(l - 1)) {
        m(syms(k) & 0xFF) = (code, l)
        code += 1
        k += 1
      }
      code <<= 1
    }
    m.toMap
  }

  private final class BitWriter {
    val out = new ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def align1s(): Unit = while (n != 0) put(1, 1)
    def raw(b: Int): Unit = { require(n == 0); out.write(b) }
  }

  private def category(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode a baseline JPEG from QUANTIZED coefficients (natural order)
    * per (component, blockY, blockX). qsel/hv per component; standard
    * tables (luma tables for comp 0, chroma for 1/2).
    */
  private def encodeJpeg(
      w: Int, h: Int,
      hv: Seq[(Int, Int)],
      coefOf: (Int, Int, Int) => Array[Int],
      dri: Int = 0): Array[Byte] = {
    val nf = hv.size
    val bw = new BitWriter
    def seg(marker: Int, payload: Array[Int]): Unit = {
      bw.raw(0xFF); bw.raw(marker)
      val len = payload.length + 2
      bw.raw(len >> 8); bw.raw(len & 0xFF)
      payload.foreach(bw.raw)
    }
    bw.raw(0xFF); bw.raw(0xD8)
    seg(0xDB, 0x00 +: lumaQzz)
    if (nf == 3) seg(0xDB, 0x01 +: chromaQzz)
    if (dri > 0) seg(0xDD, Array(dri >> 8, dri & 0xFF))
    val sof = ArrayBuffer(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nf)
    for (i <- 0 until nf)
      sof ++= Seq(i + 1, (hv(i)._1 << 4) | hv(i)._2, if (i == 0) 0 else 1)
    seg(0xC0, sof.toArray)
    def dht(tc: Int, th: Int, counts: Array[Int], syms: Array[Byte]): Unit =
      seg(0xC4, ((tc << 4) | th) +: (counts ++ syms.map(_ & 0xFF)))
    dht(0, 0, dcLumaCounts, dcLumaSyms)
    dht(1, 0, acLumaCounts, acLumaSyms)
    if (nf == 3) {
      dht(0, 1, dcChromaCounts, dcChromaSyms)
      dht(1, 1, acChromaCounts, acChromaSyms)
    }
    val sos = ArrayBuffer(nf)
    for (i <- 0 until nf) sos ++= Seq(i + 1, if (i == 0) 0x00 else 0x11)
    sos ++= Seq(0, 63, 0)
    seg(0xDA, sos.toArray)

    val dcCodes = Seq(canonicalCodes(dcLumaCounts, dcLumaSyms),
      canonicalCodes(dcChromaCounts, dcChromaSyms))
    val acCodes = Seq(canonicalCodes(acLumaCounts, acLumaSyms),
      canonicalCodes(acChromaCounts, acChromaSyms))
    val maxH = hv.map(_._1).max
    val maxV = hv.map(_._2).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val pred = Array.fill(nf)(0)
    var rst = 0
    var sinceRst = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (dri > 0 && sinceRst == dri) {
        bw.align1s()
        bw.raw(0xFF); bw.raw(0xD0 + rst)
        rst = (rst + 1) & 7
        java.util.Arrays.fill(pred, 0)
        sinceRst = 0
      }
      for (ci <- 0 until nf; bv <- 0 until hv(ci)._2; bh <- 0 until hv(ci)._1) {
        val ti = if (ci == 0) 0 else 1
        val coef = coefOf(ci, my * hv(ci)._2 + bv, mx * hv(ci)._1 + bh)
        val diff = coef(0) - pred(ci)
        pred(ci) = coef(0)
        val s = category(diff)
        val (c, l) = dcCodes(ti)(s)
        bw.put(c, l)
        if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        var k = 1
        var run = 0
        while (k < 64) {
          val v = coef(ZZ(k))
          if (v == 0) run += 1
          else {
            while (run >= 16) {
              val (zc, zl) = acCodes(ti)(0xF0); bw.put(zc, zl); run -= 16
            }
            val sz = category(v)
            val (ac, al) = acCodes(ti)((run << 4) | sz)
            bw.put(ac, al)
            bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acCodes(ti)(0x00); bw.put(ec, el) }
      }
      sinceRst += 1
    }
    bw.align1s()
    bw.raw(0xFF); bw.raw(0xD9)
    bw.out.toByteArray
  }

  // ---- independent expected-pixel path: DIRECT 2-D IDCT ---------------
  private def directIdct(coefQ: Array[Int], q: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    // natural order: coef index u*8+v with u the VERTICAL frequency —
    // so the row coordinate y pairs with u and the column x with v
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv * (coefQ(u * 8 + v) * q(u * 8 + v)).toDouble *
          math.cos((2 * y + 1) * u * math.Pi / 16.0) *
          math.cos((2 * x + 1) * v * math.Pi / 16.0)
      }
      val p = math.floor(s / 4.0 + 128.5).toInt
      out(y * 8 + x) = math.max(0, math.min(255, p))
    }
    out
  }

  private def expectedPixels(
      w: Int, h: Int, hv: Seq[(Int, Int)],
      coefOf: (Int, Int, Int) => Array[Int]): Array[Int] = {
    val nf = hv.size
    val maxH = hv.map(_._1).max
    val maxV = hv.map(_._2).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val planes = (0 until nf).map { ci =>
      val pw = mcusX * 8 * hv(ci)._1
      val ph = mcusY * 8 * hv(ci)._2
      val pl = new Array[Int](pw * ph)
      for (by <- 0 until mcusY * hv(ci)._2; bx <- 0 until mcusX * hv(ci)._1) {
        val q = if (ci == 0) lumaQ else chromaQ
        val blk = directIdct(coefOf(ci, by, bx), q)
        for (y <- 0 until 8; x <- 0 until 8)
          pl((by * 8 + y) * pw + bx * 8 + x) = blk(y * 8 + x)
      }
      (pl, pw)
    }
    def clamp(v: Double): Int = {
      val q = math.floor(v + 0.5).toInt
      math.max(0, math.min(255, q))
    }
    if (nf == 1) {
      val (pl, pw) = planes(0)
      Array.tabulate(w * h)(i => pl((i / w) * pw + i % w))
    } else {
      val out = new Array[Int](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        def sample(ci: Int): Double = {
          val (pl, pw) = planes(ci)
          pl((y * hv(ci)._2 / maxV) * pw + x * hv(ci)._1 / maxH).toDouble
        }
        val yy = sample(0); val cb = sample(1); val cr = sample(2)
        val o = (y * w + x) * 3
        out(o) = clamp(yy + 1.402 * (cr - 128.0))
        out(o + 1) = clamp(yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
        out(o + 2) = clamp(yy + 1.772 * (cb - 128.0))
      }
      out
    }
  }

  private def decode(bytes: Array[Byte], maxPixels: Int = 1 << 20): Array[Int] = {
    val r = JpegCodec.baselinePixels(bytes, maxPixels)
    if (r == null) null else r.map(_ & 0xFF)
  }

  private def rng(seed: Int): () => Int = {
    var s = seed.toLong
    () => { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 1000).toInt }
  }

  /** Deterministic sparse coefficient block: DC + a few low-freq ACs. */
  private def coefGen(seed: Int)(ci: Int, by: Int, bx: Int): Array[Int] = {
    val r = rng(seed * 7919 + ci * 131 + by * 17 + bx)
    val c = new Array[Int](64)
    c(0) = r() % 40 - 20
    c(1) = r() % 9 - 4   // horizontal freq 1 (natural order: u=0,v=1)
    c(8) = r() % 9 - 4   // vertical freq 1
    c(9) = r() % 5 - 2
    c(16) = r() % 3 - 1
    c
  }

  test("grayscale 4:4:4: coefficients round-trip through huffman + IDCT") {
    for (seed <- 1 to 5; (w, h) <- Seq((8, 8), (16, 8), (24, 16), (13, 11))) {
      val gen = coefGen(seed) _
      val bytes = encodeJpeg(w, h, Seq((1, 1)), gen)
      val got = decode(bytes)
      assert(got != null, s"decode failed seed=$seed ${w}x$h")
      assert(got.toSeq === expectedPixels(w, h, Seq((1, 1)), gen).toSeq,
        s"pixel drift seed=$seed ${w}x$h")
    }
  }

  test("color 4:4:4 and subsampled 4:2:0 / 4:2:2 decode with replication") {
    for (seed <- 1 to 3;
         hv <- Seq(Seq((1, 1), (1, 1), (1, 1)),
           Seq((2, 2), (1, 1), (1, 1)),
           Seq((2, 1), (1, 1), (1, 1)));
         (w, h) <- Seq((16, 16), (20, 12))) {
      val gen = coefGen(seed) _
      val bytes = encodeJpeg(w, h, hv, gen)
      val got = decode(bytes)
      assert(got != null, s"decode failed seed=$seed hv=$hv ${w}x$h")
      assert(got.toSeq === expectedPixels(w, h, hv, gen).toSeq,
        s"pixel drift seed=$seed hv=$hv ${w}x$h")
    }
  }

  test("byte stuffing occurs in the corpus and decodes transparently") {
    // scan seeds until an encoded stream contains FF 00 (stuffed data FF);
    // the deterministic generator makes this reproducible
    val found = (1 to 60).find { seed =>
      val b = encodeJpeg(24, 24, Seq((1, 1)), coefGen(seed) _)
      b.sliding(2).exists(p => (p(0) & 0xFF) == 0xFF && p(1) == 0x00) &&
        decode(b) != null
    }
    assert(found.nonEmpty, "no seed produced a stuffed byte")
    val gen = coefGen(found.get) _
    assert(decode(encodeJpeg(24, 24, Seq((1, 1)), gen)).toSeq ===
      expectedPixels(24, 24, Seq((1, 1)), gen).toSeq)
  }

  test("restart markers: DRI interval resets predictors and byte-aligns") {
    val gen = coefGen(9) _
    val bytes = encodeJpeg(32, 16, Seq((1, 1)), gen, dri = 2)
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) >= 0xD0 && (p(1) & 0xFF) <= 0xD7))
    assert(decode(bytes).toSeq ===
      expectedPixels(32, 16, Seq((1, 1)), gen).toSeq)
  }

  test("strict rejects: progressive, truncation, garbage, bounds, 16-bit DQT") {
    val gen = coefGen(3) _
    val good = encodeJpeg(16, 16, Seq((1, 1)), gen)
    assert(decode(good) != null)
    // progressive: flip SOF0 -> SOF2
    val prog = good.clone()
    val sofIdx = good.indices.find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC0).get
    prog(sofIdx + 1) = 0xC2.toByte
    assert(decode(prog) == null)
    // truncation mid-entropy
    assert(decode(good.take(good.length - 6)) == null)
    // missing EOI
    assert(decode(good.take(good.length - 2)) == null)
    // pixel bound enforced BEFORE decode
    assert(decode(good, maxPixels = 255) == null)
    assert(decode(good, maxPixels = 256) != null)
    // 16-bit quant table (Pq=1)
    val dqtIdx = good.indices.find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xDB).get
    val q16 = good.clone()
    q16(dqtIdx + 4) = 0x10.toByte
    assert(decode(q16) == null)
    // garbage body: an unstuffed FF marker inside entropy data
    val sosIdx = good.indices.find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xDA).get
    val corrupt = good.clone()
    corrupt(sosIdx + 14) = 0xFF.toByte
    corrupt(sosIdx + 15) = 0x77.toByte
    assert(decode(corrupt) == null)
    // not a JPEG at all
    assert(decode("plainly not a jpeg".getBytes) == null)
    assert(decode(Array[Byte]()) == null)
  }

  private def imageioRoundTrip(
      w: Int, h: Int, rgbOf: (Int, Int) => Int): (Int, Double) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbOf(x, y))
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val got = decode(bytes)
    assert(got != null, "kernel rejected an ImageIO-encoded baseline JPEG")
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var worst = 0
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      val d0 = math.abs(((rgb >> 16) & 0xFF) - got(o))
      val d1 = math.abs(((rgb >> 8) & 0xFF) - got(o + 1))
      val d2 = math.abs((rgb & 0xFF) - got(o + 2))
      worst = math.max(worst, math.max(d0, math.max(d1, d2)))
      sum += d0 + d1 + d2
    }
    (worst, sum.toDouble / (w * h * 3))
  }

  test("javax.imageio interop: real libjpeg-family output decodes close") {
    // constant-chroma (gray) content: the upsampler cannot differ, so
    // only IDCT-variant deltas remain — tight bound
    val (gw, gm) = imageioRoundTrip(40, 24, (x, y) => {
      val v = ((x * 255) / 39 + (y * 255) / 23) / 2
      (v << 16) | (v << 8) | v
    })
    assert(gw <= 3, s"gray worst delta $gw vs ImageIO (IDCT-variant only)")
    assert(gm <= 1.0, s"gray mean delta $gm vs ImageIO")
    // full color gradient: libjpeg's FANCY (linear) chroma upsampling vs
    // our documented replication diverges by ~chromaStep·1.402 per cell
    // (measured worst 9 / mean 2.19 here) — calibrated loose bounds; a
    // transposed block or broken predictor blows them by an order
    val (cw, cm) = imageioRoundTrip(40, 24, (x, y) => {
      val r = (x * 255) / 39
      val g = (y * 255) / 23
      val b = ((x + y) * 255) / 62
      (r << 16) | (g << 8) | b
    })
    assert(cw <= 16, s"color worst delta $cw vs ImageIO decode")
    assert(cm <= 4.0, s"color mean delta $cm vs ImageIO decode")
  }
}
