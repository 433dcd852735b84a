package graft.expressions

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, GZIPOutputStream}

import graft.SparkSpec

class GzipCodecSpec extends SparkSpec {

  private def gzip(payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(payload)
    g.close()
    bos.toByteArray
  }

  /** Hand-built member with chosen FLG fields (FEXTRA/FNAME/FCOMMENT/
    * FHCRC) around a real-Deflater raw stream.
    */
  private def member(
      payload: Array[Byte],
      extra: Option[Array[Byte]] = None,
      name: Option[String] = None,
      comment: Option[String] = None,
      hcrc: Boolean = false): Array[Byte] = {
    val h = new ByteArrayOutputStream()
    val flg = (if (hcrc) 2 else 0) | extra.map(_ => 4).getOrElse(0) |
      name.map(_ => 8).getOrElse(0) | comment.map(_ => 16).getOrElse(0)
    h.write(Array[Byte](0x1f, 0x8b.toByte, 8, flg.toByte, 0, 0, 0, 0, 0, 3))
    extra.foreach { e =>
      h.write(e.length & 0xff); h.write((e.length >> 8) & 0xff); h.write(e)
    }
    name.foreach { n => h.write(n.getBytes("ISO-8859-1")); h.write(0) }
    comment.foreach { c => h.write(c.getBytes("ISO-8859-1")); h.write(0) }
    if (hcrc) {
      val c = new CRC32(); val hb = h.toByteArray
      c.update(hb, 0, hb.length)
      val v = (c.getValue & 0xffff).toInt
      h.write(v & 0xff); h.write((v >> 8) & 0xff)
    }
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](payload.length * 2 + 64)
    val n = d.deflate(buf); d.end()
    h.write(buf, 0, n)
    val crc = new CRC32(); crc.update(payload, 0, payload.length)
    val cv = crc.getValue
    (0 until 4).foreach(i => h.write(((cv >> (8 * i)) & 0xff).toInt))
    val is = payload.length.toLong & 0xffffffffL
    (0 until 4).foreach(i => h.write(((is >> (8 * i)) & 0xff).toInt))
    h.toByteArray
  }

  test("real GZIPOutputStream round-trips; trailing garbage rejects") {
    val p = "hello gzip world, hello gzip world, hello".getBytes("UTF-8")
    val gz = gzip(p)
    assert(GzipKernel.inflate(gz, 1 << 20).toSeq === p.toSeq)
    assert(GzipKernel.inflate(gz ++ Array[Byte](0), 1 << 20) === null)
    assert(GzipKernel.inflate(gz.dropRight(1), 1 << 20) === null)
  }

  test("optional header fields walk: FEXTRA, FNAME, FCOMMENT, FHCRC") {
    val p = "payload under optional fields".getBytes("UTF-8")
    val variants = Seq(
      member(p, extra = Some(Array[Byte](1, 2, 3, 4))),
      member(p, name = Some("file.warc")),
      member(p, comment = Some("a comment")),
      member(p, hcrc = true),
      member(p, extra = Some(Array[Byte](9)), name = Some("n"),
        comment = Some("c"), hcrc = true))
    variants.foreach { m =>
      assert(GzipKernel.inflate(m, 1 << 20).toSeq === p.toSeq)
    }
    // corrupted FHCRC must reject
    val bad = member(p, hcrc = true)
    bad(10) = (bad(10) ^ 1).toByte
    assert(GzipKernel.inflate(bad, 1 << 20) === null)
  }

  test("trailer verification: flipped CRC32 or ISIZE rejects") {
    val p = "check the trailer".getBytes("UTF-8")
    val gz = gzip(p)
    val badCrc = gz.clone()
    badCrc(gz.length - 8) = (badCrc(gz.length - 8) ^ 1).toByte
    assert(GzipKernel.inflate(badCrc, 1 << 20) === null)
    val badIsize = gz.clone()
    badIsize(gz.length - 4) = (badIsize(gz.length - 4) ^ 1).toByte
    assert(GzipKernel.inflate(badIsize, 1 << 20) === null)
  }

  test("bad magic, wrong CM, reserved FLG bits reject") {
    val gz = gzip("x".getBytes)
    val m1 = gz.clone(); m1(0) = 0x1e
    val m2 = gz.clone(); m2(2) = 7
    val m3 = gz.clone(); m3(3) = (m3(3) | 0x20).toByte
    Seq(m1, m2, m3).foreach(m => assert(GzipKernel.inflate(m, 1 << 20) === null))
  }

  test("decompression-bomb cap: output past maxBytes nulls") {
    val p = Array.fill[Byte](10000)('a')
    val gz = gzip(p)
    assert(GzipKernel.inflate(gz, 10000).length === 10000)
    assert(GzipKernel.inflate(gz, 9999) === null)
  }

  test("member concatenation walks in order; one bad member poisons all") {
    val a = "first member".getBytes("UTF-8")
    val b = "second, longer member with more text".getBytes("UTF-8")
    val c = "third".getBytes("UTF-8")
    val file = gzip(a) ++ member(b, name = Some("b.rec")) ++ gzip(c)
    val got = GzipKernel.members(file, 16, 1 << 20)
    assert(got.length === 3)
    assert(got(0).toSeq === a.toSeq)
    assert(got(1).toSeq === b.toSeq)
    assert(got(2).toSeq === c.toSeq)
    // over the member bound
    assert(GzipKernel.members(file, 2, 1 << 20) === null)
    // corrupt the middle member's trailer -> whole file quarantines
    val bad = file.clone()
    bad(gzip(a).length + member(b, name = Some("b.rec")).length - 6) =
      (bad(gzip(a).length + member(b, name = Some("b.rec")).length - 6) ^ 1).toByte
    assert(GzipKernel.members(bad, 16, 1 << 20) === null)
    // empty input is not a valid member chain
    assert(GzipKernel.members(Array.emptyByteArray, 16, 1 << 20) === null)
  }

  test("expressions evaluate through the SQL plan (codegen path)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val p0 = "alpha record payload".getBytes("UTF-8")
    val p1 = "beta".getBytes("UTF-8")
    val rows = Seq(
      (1L, gzip(p0) ++ gzip(p1)), // valid two-member chain
      (2L, gzip(p0).dropRight(2)), // truncated
      (3L, Array[Byte](1, 2, 3))) // not gzip
    val df = rows.toDF("id", "gz")
    val out = df.select(col("id"),
      org.apache.spark.sql.graft.bridge.column(GzipMembers(
        org.apache.spark.sql.graft.bridge.expression(col("gz")), 8, 1 << 20))
        .as("m"))
      .selectExpr("id", "transform(m, x -> decode(x, 'UTF-8')) AS t")
      .as[(Long, Option[Seq[String]])].collect().toMap
    assert(out(1L) === Some(Seq("alpha record payload", "beta")))
    assert(out(2L) === None)
    assert(out(3L) === None)
    val one = df.filter(col("id") === 2L).select(
      org.apache.spark.sql.graft.bridge.column(GzipInflate(
        org.apache.spark.sql.graft.bridge.expression(col("gz")), 1 << 20))
        .as("b")).collect().head
    assert(one.isNullAt(0))
  }
}
