package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PnmSpec extends SparkSpec {

  private def pgm(w: Int, h: Int, pix: Array[Byte]): Array[Byte] =
    s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ pix

  private def ppm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb

  private def metaOf(payloads: Seq[(Long, Array[Byte])]) = {
    val s = spark
    import s.implicits._
    payloads.toDF("id", "payload")
      .select(col("id"), Multimodal.decodePnmMeta(col("payload")).as("m"))
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
  }

  private def hashOf(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column) =
    df.select(c.as("h")).collect().head.getAs[Long]("h")

  test("header decode: dims, maxval, data offset; malformations reject") {
    val good = pgm(3, 2, Array.fill[Byte](6)(7))
    val wide = ppm(17, 5, Array.fill[Byte](255)(0x41))
    val bad16bit = "P5\n3 2\n65535\n".getBytes("US-ASCII") ++ Array.fill[Byte](12)(0)
    val comment = "P5\n# a comment\n3 2\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](6)(0)
    val p4 = "P4\n3 2\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](6)(0)
    val truncated = pgm(3, 2, Array.fill[Byte](5)(7))
    val out = metaOf(Seq(1L -> good, 2L -> wide, 3L -> bad16bit,
      4L -> comment, 5L -> p4, 6L -> truncated))
    assert(out(1L).getAs[String]("format") == "P5")
    assert(out(1L).getAs[Long]("width") == 3L && out(1L).getAs[Long]("height") == 2L)
    assert(out(1L).getAs[Long]("data_offset") == 12L) // "P5\n3 2\n255\n" = 11 bytes
    assert(out(2L).getAs[String]("format") == "P6")
    assert(out(2L).getAs[Long]("width") == 17L)
    assert(out(3L) == null && out(4L) == null && out(5L) == null && out(6L) == null)
  }

  test("binary pixel bytes (invalid UTF-8) never disturb the header parse") {
    val pix = Array.tabulate[Byte](12)(i => (0xF0 + i).toByte)
    val out = metaOf(Seq(1L -> ppm(2, 2, pix)))
    assert(out(1L).getAs[Long]("data_offset") == 12L)
  }

  test("pixel stats exact on a hand 2x2 PPM") {
    val rgb = Array[Byte](
      10, 20, 30, 40, 50, 60,
      70, 80, 90, 100, 110, 120)
    val s = spark
    import s.implicits._
    val r = Multimodal.pnmDecodedFrame(
      Seq((1L, ppm(2, 2, rgb))).toDF("id", "payload"), "id", "payload")
      .collect().head
    assert(r.getAs[Long]("n_pixels") == 4L)
    assert(r.getAs[Double]("c0_mean") == (10 + 40 + 70 + 100) / 4.0)
    assert(r.getAs[Int]("c1_min") == 20 && r.getAs[Int]("c1_max") == 110)
    assert(r.getAs[Double]("c2_mean") == (30 + 60 + 90 + 120) / 4.0)
    assert(!r.getAs[Boolean]("is_blank"))
    assert(r.getAs[Int]("channels") == 3 && r.getAs[String]("format") == "P6")
  }

  test("cross-format parity: one image hashes identically as PGM, PPM, BMP, PNG") {
    val (w, h) = (16, 12)
    val gray = Array.tabulate[Byte](w * h)(i => ((i * 37 + 11) % 256).toByte)
    val rgb = gray.flatMap(v => Array(v, v, v))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gray(y * w + x) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def imageBytes(fmt: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val s = spark
    import s.implicits._
    val df = Seq((1L, pgm(w, h, gray), ppm(w, h, rgb),
      imageBytes("bmp"), imageBytes("png")))
      .toDF("id", "asPgm", "asPpm", "asBmp", "asPng")
    val hPgm = hashOf(df, Multimodal.pnmAHash(col("asPgm")))
    val hPpm = hashOf(df, Multimodal.pnmAHash(col("asPpm")))
    val hBmp = hashOf(df, Multimodal.bmpAHash(col("asBmp")))
    val hPng = hashOf(df, Multimodal.pngAHash(col("asPng")))
    assert(hPgm == hPpm, "PGM vs PPM")
    assert(hPgm == hBmp, "PNM vs BMP")
    assert(hPgm == hPng, "PNM vs PNG")
  }

  test("an unrelated image lands far in Hamming distance") {
    val (w, h) = (16, 12)
    val a = Array.tabulate[Byte](w * h)(i => ((i * 37 + 11) % 256).toByte)
    // block pattern: visually structured, very different majority layout
    val b = Array.tabulate[Byte](w * h)(i =>
      (if ((i / w) < h / 2) 230 else 10).toByte)
    val s = spark
    import s.implicits._
    val df = Seq((1L, pgm(w, h, a), pgm(w, h, b))).toDF("id", "pa", "pb")
    val ha = hashOf(df, Multimodal.pnmAHash(col("pa")))
    val hb = hashOf(df, Multimodal.pnmAHash(col("pb")))
    assert(java.lang.Long.bitCount(ha ^ hb) > 16)
  }

  test("null payload → null meta/stats/hash") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option.empty[Array[Byte]])).toDF("id", "payload")
    val r = df.select(
      Multimodal.decodePnmMeta(col("payload")).as("a"),
      Multimodal.pnmAHash(col("payload")).as("c")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    val fr = Multimodal.pnmDecodedFrame(df, "id", "payload").collect().head
    assert(fr.isNullAt(fr.fieldIndex("format")) && fr.isNullAt(fr.fieldIndex("ahash")) &&
      fr.isNullAt(fr.fieldIndex("n_pixels")))
  }
}
