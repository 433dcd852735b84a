package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZipMetaSpec extends SparkSpec {

  private def zip(
      entries: Seq[(String, Array[Byte], Int)],
      comment: Option[String] = None): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    comment.foreach(zos.setComment)
    entries.foreach { case (name, data, method) =>
      val e = new ZipEntry(name)
      e.setMethod(method)
      if (method == ZipEntry.STORED) {
        e.setSize(data.length.toLong)
        val crc = new java.util.zip.CRC32(); crc.update(data)
        e.setCrc(crc.getValue)
      }
      zos.putNextEntry(e); zos.write(data); zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private def decode(payloads: Seq[(Long, Array[Byte])]) = {
    val s = spark
    import s.implicits._
    payloads.toDF("id", "payload")
      .select(col("id"), Multimodal.decodeZipMeta(col("payload")).as("m"))
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
  }

  test("JDK-written zip: entry count, methods, exact uncompressed total") {
    val data1 = Array.fill[Byte](1000)(7) // compressible
    val data2 = "short".getBytes("US-ASCII")
    val z = zip(Seq(
      ("a.bin", data1, ZipEntry.DEFLATED),
      ("b.txt", data2, ZipEntry.STORED),
      ("dir/c.bin", data1, ZipEntry.DEFLATED)))
    val m = decode(Seq((1L, z)))(1L)
    assert(m != null, "JDK zip must decode")
    assert(m.getAs[Int]("n_entries") == 3)
    assert(m.getAs[Long]("total_uncompressed") == 2005L)
    assert(m.getAs[Int]("n_stored") == 1 && m.getAs[Int]("n_deflated") == 2)
    assert(m.getAs[Long]("total_compressed") < 2005L) // deflate actually shrank
    assert(m.getAs[Int]("comment_len") == 0)
  }

  test("archive comment: EOCD found through the backward scan") {
    val z = zip(Seq(("x", "data".getBytes, ZipEntry.STORED)),
      comment = Some("release build 42"))
    val m = decode(Seq((1L, z)))(1L)
    assert(m != null)
    assert(m.getAs[Int]("comment_len") == 16)
    assert(m.getAs[Int]("n_entries") == 1)
  }

  test("empty archive decodes as zero entries") {
    // ZipOutputStream refuses truly empty archives; hand-write EOCD
    val eocd = Array[Byte](0x50, 0x4B, 5, 6, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val m = decode(Seq((1L, eocd)))(1L)
    assert(m != null && m.getAs[Int]("n_entries") == 0)
    assert(m.getAs[Long]("total_uncompressed") == 0L)
  }

  test("malformations reject: truncated cd, corrupt entry sig, no EOCD, short file") {
    val good = zip(Seq(("x", "hello".getBytes, ZipEntry.STORED)))
    val noEocd = good.dropRight(1)
    // corrupt the central-directory entry signature (find PK\x01\x02)
    val corrupted = good.clone()
    val cdIdx = corrupted.indices.find(i =>
      i + 3 < corrupted.length && corrupted(i) == 0x50 && corrupted(i + 1) == 0x4B &&
        corrupted(i + 2) == 1 && corrupted(i + 3) == 2).get
    corrupted(cdIdx + 2) = 9
    // splice: EOCD claims 2 entries but cd holds 1
    val spliced = good.clone()
    val eocdIdx = spliced.indices.find(i =>
      i + 3 < spliced.length && spliced(i) == 0x50 && spliced(i + 1) == 0x4B &&
        spliced(i + 2) == 5 && spliced(i + 3) == 6).get
    spliced(eocdIdx + 10) = 2
    val out = decode(Seq(
      (1L, good), (2L, noEocd), (3L, corrupted), (4L, spliced),
      (5L, Array[Byte](0x50, 0x4B))))
    assert(out(1L) != null)
    assert(out(2L) == null && out(3L) == null && out(4L) == null && out(5L) == null)
  }

  test("a stray EOCD signature inside file data cannot fool the scan") {
    // data containing PK\x05\x06 followed by bytes that break the
    // commentLen-distance identity
    val trap = Array[Byte](0x50, 0x4B, 5, 6) ++ Array.fill[Byte](30)(1)
    val z = zip(Seq(("trap.bin", trap, ZipEntry.STORED)))
    val m = decode(Seq((1L, z)))(1L)
    assert(m != null && m.getAs[Int]("n_entries") == 1)
    assert(m.getAs[Long]("total_uncompressed") == trap.length.toLong)
  }
}
