package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TiffMetaSpec extends SparkSpec {

  /** Hand-mux a minimal single-IFD TIFF. Entries are
    * (tag, type, count, rawValueField); SHORT inline values must be
    * pre-left-justified by the caller via `shortVal`.
    */
  private def tiff(
      le: Boolean,
      entries: Seq[(Int, Int, Int, Int)],
      trailing: Array[Byte] = Array.emptyByteArray,
      ifdOffset: Int = 8,
      magic: Int = 42,
      declaredN: Option[Int] = None): Array[Byte] = {
    val size = ifdOffset + 2 + entries.size * 12 + 4 + trailing.length
    val bb = ByteBuffer.allocate(size)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    bb.put((if (le) "II" else "MM").getBytes("US-ASCII"))
    bb.putShort(magic.toShort)
    bb.putInt(ifdOffset)
    while (bb.position() < ifdOffset) bb.put(0.toByte)
    bb.putShort(declaredN.getOrElse(entries.size).toShort)
    entries.foreach { case (tag, typ, cnt, v) =>
      bb.putShort(tag.toShort); bb.putShort(typ.toShort)
      bb.putInt(cnt); bb.putInt(v)
    }
    bb.putInt(0) // next-IFD terminator
    bb.put(trailing)
    bb.array()
  }

  /** A SHORT inline value is left-justified in the 4-byte field: as a
    * raw int written in the file's order, that is value<<16 for BE and
    * plain value for LE.
    */
  private def shortVal(le: Boolean, v: Int): Int = if (le) v else v << 16

  private def decode(payloads: Seq[(Long, Array[Byte])]) = {
    val s = spark
    import s.implicits._
    payloads.toDF("id", "payload")
      .select(col("id"), Multimodal.decodeTiffMeta(col("payload")).as("m"))
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
  }

  test("little-endian SHORT dims decode exactly") {
    val le = true
    val t = tiff(le, Seq(
      (256, 3, 1, shortVal(le, 640)), (257, 3, 1, shortVal(le, 480)),
      (258, 3, 1, shortVal(le, 8)), (259, 3, 1, shortVal(le, 1)),
      (277, 3, 1, shortVal(le, 1))))
    val m = decode(Seq((1L, t)))(1L)
    assert(m.getAs[String]("byte_order") == "II")
    assert(m.getAs[Int]("n_entries") == 5)
    assert(m.getAs[Long]("width") == 640L && m.getAs[Long]("height") == 480L)
    assert(m.getAs[Int]("bits_per_sample") == 8)
    assert(m.getAs[Int]("compression") == 1)
    assert(m.getAs[Int]("samples_per_pixel") == 1)
  }

  test("big-endian LONG dims + count-3 BitsPerSample behind an offset") {
    val le = false
    // IFD: 3 entries at 8 → table spans 8..49 (2+36+4); bps triple at 50
    val bpsOffset = 8 + 2 + 3 * 12 + 4
    val trailing = {
      val bb = ByteBuffer.allocate(6).order(ByteOrder.BIG_ENDIAN)
      bb.putShort(16).putShort(16).putShort(16); bb.array()
    }
    val t = tiff(le, Seq(
      (256, 4, 1, 70000), (257, 4, 1, 81234),
      (258, 3, 3, bpsOffset)), trailing = trailing)
    val m = decode(Seq((1L, t)))(1L)
    assert(m.getAs[String]("byte_order") == "MM")
    assert(m.getAs[Long]("width") == 70000L && m.getAs[Long]("height") == 81234L)
    assert(m.getAs[Int]("bits_per_sample") == 16)
    assert(m.isNullAt(m.fieldIndex("compression"))) // absent tag → null field
  }

  test("IFD behind a gap (non-8 offset) still found") {
    val le = true
    val t = tiff(le, Seq((256, 3, 1, shortVal(le, 99))), ifdOffset = 40)
    val m = decode(Seq((1L, t)))(1L)
    assert(m.getAs[Long]("width") == 99L)
  }

  test("malformations reject to NULL: magic, truncation, zero entries, short file") {
    val le = true
    val good = tiff(le, Seq((256, 3, 1, shortVal(le, 10))))
    val badMagic = tiff(le, Seq((256, 3, 1, shortVal(le, 10))), magic = 43)
    val zeroEntries = tiff(le, Seq())
    // declares 5 entries but carries 1 → table runs past EOF
    val truncated = tiff(le, Seq((256, 3, 1, shortVal(le, 10))), declaredN = Some(5))
    val shortFile = Array[Byte]('I', 'I', 42, 0)
    val out = decode(Seq(
      (1L, good), (2L, badMagic), (3L, zeroEntries), (4L, truncated), (5L, shortFile)))
    assert(out(1L) != null)
    assert(out(2L) == null && out(3L) == null && out(4L) == null && out(5L) == null)
  }

  test("real ImageIO TIFF round-trips true dimensions") {
    val img = new java.awt.image.BufferedImage(
      37, 23, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 23).foreach(y => (0 until 37).foreach(x =>
      img.setRGB(x, y, (x * 7 + y * 13) << 8)))
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", bos), "JDK TIFF writer available")
    val m = decode(Seq((1L, bos.toByteArray)))(1L)
    assert(m != null, "ImageIO TIFF must decode")
    assert(m.getAs[Long]("width") == 37L && m.getAs[Long]("height") == 23L)
    assert(m.getAs[Int]("samples_per_pixel") == 3)
  }

  test("null payload → null struct") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option.empty[Array[Byte]])).toDF("id", "payload")
      .select(Multimodal.decodeTiffMeta(col("payload")).as("m"))
    assert(df.collect().head.isNullAt(0))
  }
}
