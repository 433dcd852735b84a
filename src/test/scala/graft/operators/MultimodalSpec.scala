package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  lazy val docs = Tables.load(spark, sf(), "documents")
    .withColumn("payload", col("text").cast("binary"))
    .cache()

  test("media meta struct: byte length and content hash are stable") {
    val m = Multimodal.withMediaMeta(docs, "payload", "text/plain")
    val row = m.select("media_meta.media_type", "media_meta.n_bytes", "media_meta.content_hash")
      .filter(col("n_bytes") > 0).limit(1).collect()(0)
    assert(row.getString(0) === "text/plain")
    // hash matches recomputation (deterministic)
    val again = Multimodal.withMediaMeta(docs, "payload", "text/plain")
    assert(m.select("doc_id", "media_meta.content_hash")
      .except(again.select("doc_id", "media_meta.content_hash")).isEmpty)
  }

  test("decode stub: plausible dimensions, null payload → null struct") {
    val withNull = docs.withColumn("payload",
      when(col("doc_id") === 0, lit(null).cast("binary")).otherwise(col("payload")))
    val d = withNull.select(col("doc_id"), Multimodal.decodeImageMetaStub(col("payload")).as("m"))
    assert(d.filter(col("doc_id") === 0).select("m").collect()(0).isNullAt(0))
    val dims = d.filter(col("m").isNotNull)
      .select(col("m.width"), col("m.height"), col("m.channels")).collect()
    assert(dims.nonEmpty)
    dims.foreach { r =>
      assert(r.getInt(0) >= 32 && r.getInt(0) < 1952)
      assert(r.getInt(1) >= 32 && r.getInt(1) < 1112)
      assert(r.getInt(2) >= 0 && r.getInt(2) < 3)
    }
  }

  test("feature stub: fixed dim, values in [-1,1], deterministic") {
    val f = docs.select(col("doc_id"), Multimodal.extractFeaturesStub(col("payload"), 16).as("v"))
    val sizes = f.select(size(col("v"))).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq === Seq(16))
    val bad = f.select(explode(col("v")).as("x")).filter(col("x") < -1.0 || col("x") > 1.0)
    assert(bad.count() === 0)
  }

  test("frame sampling: n frames, fixed width, covers payload start to end") {
    val fr = docs.filter(length(col("payload")) >= 128)
      .select(col("doc_id"), col("payload"), Multimodal.sampleFramesStub(col("payload"), 4, 64).as("frames"))
    val r = fr.limit(1).collect()(0)
    val frames = r.getSeq[Array[Byte]](2)
    assert(frames.size === 4)
    assert(frames.forall(_.length == 64))
    val payload = r.getAs[Array[Byte]]("payload")
    assert(frames.head.toSeq === payload.take(64).toSeq, "first frame at start")
    assert(frames.last.toSeq === payload.takeRight(64).toSeq, "last frame at end")
  }

  test("PNG header decode: real ImageIO-written PNGs round-trip true dimensions") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def png(w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      img.setRGB(0, 0, 0x123456) // non-trivial pixel so the encoder can't degenerate
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", bos), "JDK PNG writer available")
      bos.toByteArray
    }
    // (id, payload, expected width/height/channels) — genuine, complete
    // PNG files from the JDK encoder, not synthetic headers: if our IHDR
    // offsets/endianness/channel map disagreed with the PNG standard,
    // these would expose it. TYPE_INT_RGB → color type 2 (3 channels),
    // TYPE_INT_ARGB → 6 (4), TYPE_BYTE_GRAY → 0 (1).
    val rows = Seq(
      (1L, png(41, 29, BufferedImage.TYPE_INT_RGB), 41, 29, 3),
      (2L, png(300, 7, BufferedImage.TYPE_INT_ARGB), 300, 7, 4),
      (3L, png(1, 1024, BufferedImage.TYPE_BYTE_GRAY), 1, 1024, 1))
    val notPng = Seq(
      (100L, "not a png at all".getBytes("UTF-8")),
      (101L, Array[Byte](0x47, 0x49, 0x46, 0x38, 0x39, 0x61)), // GIF89a
      (102L, Array.empty[Byte]))
    import spark.implicits._
    val df = (rows.map { case (id, p, _, _, _) => (id, p) } ++ notPng)
      .toDF("id", "payload")
      .withColumn("m", Multimodal.decodePngMeta(col("payload")))
    val decoded = df.filter(col("m").isNotNull)
      .select(col("id"), col("m.width"), col("m.height"), col("m.bit_depth"), col("m.channels"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(decoded.keySet === Set(1L, 2L, 3L), "only real PNGs decode; non-PNG → null")
    rows.foreach { case (id, _, w, h, ch) =>
      val (dw, dh, depth, dch) = decoded(id)
      assert((dw, dh) === ((w, h)), s"id=$id dimensions")
      assert(depth === 8, s"id=$id bit depth")
      assert(dch === ch, s"id=$id channels")
    }
  }

  test("WAV header decode: real AudioSystem-written PCM WAVs round-trip true format") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    def wav(rate: Float, bits: Int, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, bits, channels, bits > 8, false) // PCM LE
      val frameBytes = channels * bits / 8
      val data = Array.fill[Byte](nFrames * frameBytes)(0x11)
      val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nFrames.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // genuine, complete WAV files from the JDK writer — if our RIFF
    // offsets/endianness/consistency checks disagreed with the spec,
    // these would expose it
    val rows = Seq(
      (1L, wav(8000f, 8, 1, 120), 1, 8000, 8, 120L),
      (2L, wav(44100f, 16, 2, 441), 2, 44100, 16, 441L),
      (3L, wav(16000f, 16, 1, 16000), 1, 16000, 16, 16000L))
    val junk = Seq(
      (100L, "RIFFnot really a wave file at all....".getBytes("UTF-8")),
      (101L, Array.empty[Byte]))
    import spark.implicits._
    val decoded = (rows.map { case (id, p, _, _, _, _) => (id, p) } ++ junk)
      .toDF("id", "payload")
      .withColumn("m", Multimodal.decodeWavMeta(col("payload")))
      .filter(col("m").isNotNull)
      .select(col("id"), col("m.channels"), col("m.sample_rate"),
        col("m.bits_per_sample"), col("m.n_samples"), col("m.duration_us"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(decoded.keySet === Set(1L, 2L, 3L), "only real PCM WAVs decode; junk → null")
    rows.foreach { case (id, _, ch, rate, bits, frames) =>
      val (dch, drate, dbits, dn, dus) = decoded(id)
      assert((dch, drate, dbits) === ((ch, rate, bits)), s"id=$id format")
      assert(dn === frames, s"id=$id sample count")
      assert(dus === frames * 1000000L / rate, s"id=$id duration")
    }
  }

  test("GIF/BMP header decode: real ImageIO-written files round-trip true dimensions") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def img(fmt: String, w: Int, h: Int): Array[Byte] = {
      val i = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      i.setRGB(0, 0, 0x123456)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(i, fmt, bos), s"JDK $fmt writer available")
      bos.toByteArray
    }
    import spark.implicits._
    val gifs = Seq((1L, img("gif", 37, 23), 37, 23), (2L, img("gif", 640, 1), 640, 1))
    val bmps = Seq((1L, img("bmp", 19, 57), 19, 57), (2L, img("bmp", 2, 300), 2, 300))
    val junk = Seq((100L, "not an image".getBytes("UTF-8")), (101L, Array.empty[Byte]))

    val gdf = (gifs.map { case (id, p, _, _) => (id, p) } ++ junk).toDF("id", "payload")
      .withColumn("m", Multimodal.decodeGifMeta(col("payload")))
    val gdec = gdf.filter(col("m").isNotNull)
      .select(col("id"), col("m.width"), col("m.height"), col("m.version"), col("m.gct_size"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4))))
      .toMap
    assert(gdec.keySet === Set(1L, 2L), "only real GIFs decode; junk → null")
    gifs.foreach { case (id, _, w, h) =>
      assert((gdec(id)._1, gdec(id)._2) === ((w, h)), s"gif id=$id dimensions")
      assert(gdec(id)._3 === "89a", "ImageIO writes GIF89a")
      assert(gdec(id)._4 > 0, "RGB GIF carries a global color table")
    }

    val bdf = (bmps.map { case (id, p, _, _) => (id, p) } ++ junk).toDF("id", "payload")
      .withColumn("m", Multimodal.decodeBmpMeta(col("payload")))
    val bdec = bdf.filter(col("m").isNotNull)
      .select(col("id"), col("m.width"), col("m.height"), col("m.top_down"), col("m.bits_per_pixel"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3), r.getInt(4))))
      .toMap
    assert(bdec.keySet === Set(1L, 2L), "only real BMPs decode; junk → null")
    bmps.foreach { case (id, _, w, h) =>
      assert((bdec(id)._1, bdec(id)._2) === ((w, h)), s"bmp id=$id dimensions")
      assert(!bdec(id)._3, "ImageIO writes bottom-up BMPs")
      assert(bdec(id)._4 === 24, "TYPE_INT_RGB encodes 24bpp")
    }
  }

  test("JPEG header decode: real ImageIO JPEGs round-trip through the marker walk") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def jpeg(w: Int, h: Int, imgType: Int): Array[Byte] = {
      val i = new BufferedImage(w, h, imgType)
      i.setRGB(0, 0, 0x123456)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(i, "jpeg", bos), "JDK JPEG writer available")
      bos.toByteArray
    }
    import spark.implicits._
    // real encoder output: SOF sits behind encoder-chosen APP0/DQT (and
    // for grayscale a different component count) at offsets we don't
    // control — the walk has to find it
    val rows = Seq(
      (1L, jpeg(43, 31, BufferedImage.TYPE_INT_RGB), 43, 31, 3),
      (2L, jpeg(512, 2, BufferedImage.TYPE_INT_RGB), 512, 2, 3),
      (3L, jpeg(9, 77, BufferedImage.TYPE_BYTE_GRAY), 9, 77, 1))
    val junk = Seq(
      (100L, "FFD8 but not really".getBytes("UTF-8")),
      (101L, Array[Byte](0xFF.toByte, 0xD8.toByte)), // bare SOI, no chain
      (102L, Array.empty[Byte]),
      (103L, jpeg(50, 50, BufferedImage.TYPE_INT_RGB).take(10))) // truncated mid-chain
    val df = (rows.map { case (id, p, _, _, _) => (id, p) } ++ junk)
      .toDF("id", "payload")
      .withColumn("m", Multimodal.decodeJpegMeta(col("payload")))
    val dec = df.filter(col("m").isNotNull)
      .select(col("id"), col("m.width"), col("m.height"), col("m.num_components"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(dec.keySet === Set(1L, 2L, 3L), "only real JPEGs decode; junk → null")
    rows.foreach { case (id, _, w, h, nc) =>
      assert(dec(id) === ((w, h, nc)), s"jpeg id=$id (width, height, components)")
    }
  }

  test("WAV sample stats: real AudioSystem PCM files yield exact per-channel content stats") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    def wav(rate: Float, bits: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
      val fmt = new AudioFormat(rate, bits, channels, bits > 8, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(data), fmt, data.length / (channels * bits / 8))
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def le16(vs: Int*): Array[Byte] =
      vs.flatMap(v => Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)).toArray
    // mono 16-bit with both rails hit: samples 1000, -1000, 32767, -32768, 0
    val mono = wav(8000f, 16, 1, le16(1000, -1000, 32767, -32768, 0))
    // stereo 8-bit UNSIGNED (128-centered): frames (138,118),(255,0),(138,118)
    val stereo = wav(8000f, 8, 2,
      Array(138, 118, 255, 0, 138, 118).map(_.toByte))
    import spark.implicits._
    val rows = Seq((1L, mono), (2L, stereo), (3L, "RIFFjunk".getBytes("UTF-8")))
      .toDF("id", "payload")
      .withColumn("st", Multimodal.wavSampleStats(col("payload")))
    val got = rows.select(col("id"), explode(col("st")).as("e"))
      .select(col("id"), col("e.channel"), col("e.n_frames"), col("e.rms"),
        col("e.peak"), col("e.n_clipped"), col("e.clipping_rate"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(got.keySet === Set((1L, 0), (2L, 0), (2L, 1)), "junk decodes to null")
    val (mn, mrms, mpeak, mclip, mrate) = got((1L, 0))
    assert(mn === 5L && mpeak === 32768L && mclip === 2L && mrate === 0.4)
    val msq = 1000.0 * 1000 * 2 + 32767.0 * 32767 + 32768.0 * 32768
    assert(math.abs(mrms - math.sqrt(msq / 5)) < 1e-9)
    val (s0n, s0rms, s0peak, s0clip, _) = got((2L, 0)) // v = 10, 127, 10
    assert(s0n === 3L && s0peak === 127L && s0clip === 1L)
    assert(math.abs(s0rms - math.sqrt((100.0 + 127 * 127 + 100) / 3)) < 1e-12)
    val (_, s1rms, s1peak, s1clip, _) = got((2L, 1)) // v = -10, -128, -10
    assert(s1peak === 128L && s1clip === 1L)
    assert(math.abs(s1rms - math.sqrt((100.0 + 128 * 128 + 100) / 3)) < 1e-12)
    // maxFrames cap: stats cover the first cap frames, n_frames reports it
    val capped = Seq((1L, mono)).toDF("id", "payload")
      .select(explode(Multimodal.wavSampleStats(col("payload"), maxFrames = 3)).as("e"))
      .select(col("e.n_frames"), col("e.peak"), col("e.n_clipped")).head()
    assert(capped.getLong(0) === 3L && capped.getLong(1) === 32767L &&
      capped.getLong(2) === 1L)
  }

  test("WAV zero crossings: real AudioSystem files, hand-computed ZCR and silence") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    def wav(rate: Float, bits: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
      val fmt = new AudioFormat(rate, bits, channels, bits > 8, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(data), fmt, data.length / (channels * bits / 8))
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def le16(vs: Int*): Array[Byte] =
      vs.flatMap(v => Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)).toArray
    // mono 16-bit square wave 1000,-1000,1000,-1000,1000: every step
    // crosses → zcr = 1; silence threshold 32768/1000 = 32, none silent
    val square = wav(8000f, 16, 1, le16(1000, -1000, 1000, -1000, 1000))
    // mono 16-bit: 5,-5,9000,0,-9000 — |v|≤32 silent (3); crossings:
    // (5,-5)=1, (-5,9000)=1, (9000,0)=0, (0,-9000)=0 → 2
    val mixed = wav(8000f, 16, 1, le16(5, -5, 9000, 0, -9000))
    // digital silence: all zeros — zcr 0, silence_rate 1
    val silent = wav(8000f, 16, 1, le16(0, 0, 0, 0))
    import spark.implicits._
    val got = Seq((1L, square), (2L, mixed), (3L, silent))
      .toDF("id", "payload")
      .select(col("id"), explode(Multimodal.wavZeroCrossings(col("payload"))).as("e"))
      .select(col("id"), col("e.n_frames"), col("e.n_zero_crossings"), col("e.zcr"),
        col("e.n_silent"), col("e.silence_rate"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got(1L) === ((5L, 4L, 1.0, 0L, 0.0)))
    assert(got(2L) === ((5L, 2L, 0.5, 3L, 0.6)))
    assert(got(3L) === ((4L, 0L, 0.0, 4L, 1.0)))
    // single frame: zcr NULL, counts still defined
    val one = Seq((1L, wav(8000f, 16, 1, le16(7))))
      .toDF("id", "payload")
      .select(explode(Multimodal.wavZeroCrossings(col("payload"))).as("e"))
      .select(col("e.n_frames"), col("e.zcr"), col("e.n_silent")).head()
    assert(one.getLong(0) === 1L && one.isNullAt(1) && one.getLong(2) === 1L)
  }

  test("BMP pixel stats: real ImageIO 24-bpp files yield exact channel stats; blank cut") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def bmp(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val i = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) i.setRGB(x, y, rgb(x, y))
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(i, "bmp", bos), "JDK BMP writer available")
      bos.toByteArray
    }
    // 3×2 (stride padding: 9 data + 3 pad bytes/row) with distinct channels
    def rgbAt(x: Int, y: Int): (Int, Int, Int) = (10 * x + 1, 20 * y + 2, x + y)
    val patterned = bmp(3, 2) { (x, y) =>
      val (r, g, b) = rgbAt(x, y); (r << 16) | (g << 8) | b
    }
    val blank = bmp(4, 3)((_, _) => (7 << 16) | (7 << 8) | 7)
    import spark.implicits._
    val got = Seq((1L, patterned), (2L, blank), (3L, Array[Byte]('B', 'M')))
      .toDF("id", "payload")
      .withColumn("m", Multimodal.bmpPixelStats(col("payload")))
    val dec = got.filter(col("m").isNotNull)
      .select(col("id"), col("m.n_pixels"), col("m.r_mean"), col("m.r_min"),
        col("m.r_max"), col("m.g_mean"), col("m.b_mean"), col("m.is_blank"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(dec.keySet === Set(1L, 2L), "truncated payload → null")
    val px = for (y <- 0 until 2; x <- 0 until 3) yield rgbAt(x, y)
    val p = dec(1L)
    assert(p.getLong(1) === 6L)
    assert(p.getDouble(2) === px.map(_._1).sum.toDouble / 6) // r_mean
    assert(p.getInt(3) === px.map(_._1).min && p.getInt(4) === px.map(_._1).max)
    assert(p.getDouble(5) === px.map(_._2).sum.toDouble / 6) // g_mean
    assert(p.getDouble(6) === px.map(_._3).sum.toDouble / 6) // b_mean
    assert(!p.getBoolean(7))
    val b = dec(2L)
    assert(b.getLong(1) === 12L && b.getBoolean(7) && b.getDouble(2) === 7.0)
    // maxPixels cap: n_pixels reports the cap, constant image stays blank
    val capped = Seq((2L, blank)).toDF("id", "payload")
      .select(Multimodal.bmpPixelStats(col("payload"), maxPixels = 5).as("m"))
      .select(col("m.n_pixels"), col("m.is_blank")).head()
    assert(capped.getLong(0) === 5L && capped.getBoolean(1))
  }

  test("BMP aHash: real ImageIO files match an independent reference; orientation-proof") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def bmp(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val i = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) i.setRGB(x, y, rgb(x, y))
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(i, "bmp", bos), "JDK BMP writer available")
      bos.toByteArray
    }
    // independent reference: nearest-neighbor 8×8, integer luma, strict
    // 64·L > ΣL, sign bit via Long.MinValue
    def refAHash(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Long = {
      val lum = (0 until 64).map { k =>
        val (x, y) = ((k % 8) * w / 8, (k / 8) * h / 8)
        val (r, g, b) = rgb(x, y)
        299L * r + 587L * g + 114L * b
      }
      val total = lum.sum
      (0 until 64).map { k =>
        if (lum(k) * 64L > total) { if (k == 0) Long.MinValue else 1L << (63 - k) }
        else 0L
      }.sum
    }
    def grad(x: Int, y: Int): (Int, Int, Int) = (16 * x + 3, 10 * y + 5, x * y)
    val img16 = bmp(16, 16) { (x, y) =>
      val (r, g, b) = grad(x, y); (r << 16) | (g << 8) | b
    }
    import spark.implicits._
    val got = Seq(
      (1L, img16),
      (2L, bmp(8, 8)((x, y) => if ((x + y) % 2 == 0) 0xFFFFFF else 0)),
      (3L, Array[Byte]('B', 'M'))) // truncated → null
      .toDF("id", "payload")
      .select(col("id"), Multimodal.bmpAHash(col("payload")).as("ah"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got(1L) === Some(refAHash(16, 16, grad)))
    // 8×8 checkerboard: every cell is one pixel; equal-luma counts mean
    // 64·L > ΣL exactly for the bright half → hash = the checker mask
    assert(got(2L) === Some(refAHash(8, 8, (x, y) =>
      if ((x + y) % 2 == 0) (255, 255, 255) else (0, 0, 0))))
    assert(got(3L) === None)
  }

  test("BMP aHash: bottom-up and top-down storage of the same image hash identically") {
    // hand-built 4×3 24-bpp payloads: same IMAGE, both storage orders
    def px(x: Int, y: Int): Seq[Byte] =
      Seq((x * 40 + y).toByte, (y * 70 + 1).toByte, (x * 9 + y * 21).toByte) // B,G,R
    def le(v: Long, n: Int): Seq[Byte] = (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte)
    def raw(topDown: Boolean): Array[Byte] = {
      val (w, h) = (4, 3)
      val stride = (w * 3 + 3) / 4 * 4
      val hStored = if (topDown) (4294967296L - h) else h.toLong
      val rows = (0 until h).flatMap { r =>
        val y = if (topDown) r else h - 1 - r // storage row r holds image row y
        (0 until w).flatMap(x => px(x, y)) ++ Seq.fill(stride - 3 * w)(0xAB.toByte)
      }
      (Seq('B'.toByte, 'M'.toByte) ++ le(54L + h * stride, 4) ++ le(0L, 4) ++
        le(54L, 4) ++ le(40L, 4) ++ le(w.toLong, 4) ++ le(hStored, 4) ++
        le(1L, 2) ++ le(24L, 2) ++ Seq.fill(24)(0.toByte) ++ rows).toArray
    }
    import spark.implicits._
    val hashes = Seq((1L, raw(topDown = false)), (2L, raw(topDown = true)))
      .toDF("id", "payload")
      .select(Multimodal.bmpAHash(col("payload")).as("ah"))
      .collect().map(_.getLong(0))
    assert(hashes(0) === hashes(1), "storage orientation must not change the hash")
  }

  test("BMP aHash near-dup: simHashPairs with the image signature finds perturbed copies") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def bmp(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val i = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) i.setRGB(x, y, rgb(x, y))
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(i, "bmp", bos), "JDK BMP writer available")
      bos.toByteArray
    }
    // 8×8 binary images: hash bits are exactly the bright-cell mask
    def mask(g: Int)(flips: Set[(Int, Int)]) = bmp(8, 8) { (x, y) =>
      if (((x + y + g) % 3 == 0) ^ flips((x, y))) 0xFFFFFF else 0
    }
    import spark.implicits._
    val docs = Seq(
      (10L, mask(0)(Set.empty)),
      (11L, mask(0)(Set((0, 0)))),                       // hamming 1 vs 10
      (12L, mask(0)(Set((0, 0), (1, 1), (2, 2)))),       // hamming 3 vs 10, 2 vs 11
      (13L, mask(1)(Set.empty))                          // different base — far
    ).toDF("doc_id", "payload")
    val pairs = NearDup.simHashPairs(
      docs, "doc_id", "payload",
      maxHamming = 3, numBlocks = 4,
      signatureOf = p => Multimodal.bmpAHash(p))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number]("hamming").longValue()).toMap
    assert(pairs.keySet === Set((10L, 11L), (10L, 12L), (11L, 12L)))
    assert(pairs((10L, 11L)) === 1L)
    assert(pairs((10L, 12L)) === 3L)
    assert(pairs((11L, 12L)) === 2L)
  }

  test("decode stage rebalances partitions by content hash") {
    val staged = Multimodal.decodeStage(docs, "payload", numPartitions = 8) { p =>
      Seq("image_meta" -> Multimodal.decodeImageMetaStub(p))
    }
    assert(staged.rdd.getNumPartitions === 8)
    val counts = staged.groupBy(spark_partition_id()).count().collect().map(_.getLong(1))
    assert(counts.length === 8)
    // hash-balanced: no partition holds more than 3x the mean
    val mean = counts.sum.toDouble / counts.length
    assert(counts.forall(_ <= mean * 3), s"skewed: ${counts.toSeq}")
  }

  test("EXIF orientation: both TIFF byte orders, sibling tags, real no-EXIF JPEG") {
    import java.nio.ByteBuffer
    def exifJpeg(le: Boolean, orientation: Int, withTag: Boolean): Array[Byte] = {
      val tiff = ByteBuffer.allocate(if (withTag) 38 else 26)
      def u16(v: Int): Unit =
        if (le) { tiff.put((v & 0xff).toByte).put((v >> 8).toByte) }
        else { tiff.put((v >> 8).toByte).put((v & 0xff).toByte) }
      def u32(v: Int): Unit =
        if (le) { u16(v & 0xffff); u16(v >>> 16) } else { u16(v >>> 16); u16(v & 0xffff) }
      tiff.put((if (le) "II" else "MM").getBytes("US-ASCII"))
      u16(42); u32(8); u16(if (withTag) 2 else 1)
      u16(0x010f); u16(2); u32(4); tiff.put("ABC ".getBytes("US-ASCII"))
      if (withTag) { u16(0x0112); u16(3); u32(1); u16(orientation); u16(0) }
      u32(0)
      val app1Len = 2 + 6 + tiff.capacity()
      val out = ByteBuffer.allocate(2 + 2 + app1Len + 4)
      out.put(Array(0xff, 0xd8, 0xff, 0xe1).map(_.toByte))
      out.put((app1Len >> 8).toByte).put((app1Len & 0xff).toByte)
      out.put("Exif".getBytes("US-ASCII")).put(Array[Byte](0, 0)).put(tiff.array())
      out.put(Array(0xff, 0xda, 0x00, 0x02).map(_.toByte)) // SOS: walk must stop
      out.array()
    }
    import spark.implicits._
    // a REAL encoder JPEG carries no APP1 Exif → null, not a misparse
    val realJpeg = {
      import java.awt.image.BufferedImage
      val img = new BufferedImage(4, 3, BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, exifJpeg(le = true, 6, withTag = true)),
      (2L, exifJpeg(le = false, 8, withTag = true)),
      (3L, exifJpeg(le = true, 1, withTag = false)),
      (4L, realJpeg))
      .toDF("id", "payload")
      .withColumn("o", Multimodal.jpegExifOrientation(col("payload")))
    val got = df.select("id", "o").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(1L -> Some(6), 2L -> Some(8), 3L -> None, 4L -> None))
  }

  test("MP4 box walk: hand-muxed ISO-BMFF files round-trip; corrupt shapes → null") {
    import java.nio.ByteBuffer
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      b.array()
    }
    def mvhd(version: Int, timescale: Int, duration: Long): Array[Byte] = {
      val body = ByteBuffer.allocate(if (version == 0) 100 else 112)
      body.put(version.toByte).put(Array[Byte](0, 0, 0)) // flags
      if (version == 0) {
        body.putInt(0).putInt(0).putInt(timescale).putInt(duration.toInt)
      } else {
        body.putLong(0L).putLong(0L).putInt(timescale).putLong(duration)
      }
      body.putInt(0x00010000).putShort(0x0100.toShort).put(new Array[Byte](10))
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(i => body.putInt(i))
      body.put(new Array[Byte](24)).putInt(2)
      box("mvhd", body.array())
    }
    val ftyp = box("ftyp", "isommp42".getBytes("US-ASCII"))
    val free = box("free", Array[Byte](1, 2, 3, 4))
    val udta = box("udta", Array[Byte](0, 0, 0, 0))
    def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    val v0 = cat(ftyp, free, box("moov", cat(udta, mvhd(0, 1000, 90000L))))
    // v1: 64-bit duration beyond 2^32, mvhd behind TWO sibling children
    val v1 = cat(ftyp, box("moov", cat(udta, free, mvhd(1, 600, 5000000123L))))
    val noMvhd = cat(ftyp, box("moov", udta))
    val badSig = { val c = v0.clone(); c(4) = 'f'; c(5) = 'r'; c(6) = 'e'; c(7) = 'e'; c }
    val truncated = v0.take(40) // moov size now points past EOF
    val zeroTs = cat(ftyp, box("moov", mvhd(0, 0, 1L)))
    val largesize = { val c = v0.clone(); c(16) = 0; c(17) = 0; c(18) = 0; c(19) = 1; c } // free box size=1

    import spark.implicits._
    val df = Seq(
      (1L, v0), (2L, v1), (3L, noMvhd), (4L, badSig), (5L, truncated),
      (6L, zeroTs), (7L, largesize))
      .toDF("id", "payload")
      .withColumn("m", Multimodal.decodeMp4Meta(col("payload")))
    val got = df.select(col("id"), col("m.major_brand"), col("m.mvhd_version"),
        col("m.timescale"), col("m.duration"), col("m.duration_us"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)))).toMap
    assert(got(1L) === ((Some("isom"), Some(0), Some(1000L), Some(90000L),
      Some(90000000L))))
    assert(got(2L) === ((Some("isom"), Some(1), Some(600L), Some(5000000123L),
      Some(5000000123L * 1000000L / 600L))))
    for (id <- 3L to 7L)
      assert(got(id) === ((None, None, None, None, None)), s"case $id must be null")
  }
}
