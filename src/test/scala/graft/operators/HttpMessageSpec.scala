package graft.operators

import java.io.ByteArrayOutputStream
import java.security.MessageDigest
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPOutputStream}

import graft.SparkSpec

/** [[HttpMessage]] — the envelope classes the arithmetic oracle
  * (q_m31) can't plant: REAL java.util.zip-compressed bodies (dynamic
  * Huffman, not the gate's stored blocks), corrupted streams,
  * unsupported codings, the x-gzip alias, connection-close framing,
  * and the chunk-budget bound.
  */
class HttpMessageSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def zlib(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new DeflaterOutputStream(bos, new Deflater())
    d.write(b); d.close()
    bos.toByteArray
  }

  private def s(bytes: Array[Byte]): String =
    new String(bytes, "ISO-8859-1")

  private def one(msg: String, maxChunks: Int = 16) =
    HttpMessage.responses(Seq((1L, msg)).toDF("id", "msg"), "id", "msg",
      maxChunks = maxChunks)
      .select("ok", "err", "status_code", "content_encoding",
        "n_body_bytes", "body_md5", "body_text")
      .as[(Boolean, String, Option[Int], String, Option[Int],
        Option[String], Option[String])]
      .head()

  test("real gzip body (dynamic Huffman) decodes; x-gzip alias too") {
    val body = ("the quick brown fox " * 20).trim
    for (coding <- Seq("gzip", "x-gzip")) {
      val gz = gzip(body.getBytes("ISO-8859-1"))
      val msg = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        s"Content-Encoding: $coding\r\nContent-Length: ${gz.length}\r\n\r\n" +
        s(gz)
      val r = one(msg)
      assert(r._1 && r._2 === "" && r._3 === Some(200))
      assert(r._4 === coding)
      assert(r._5 === Some(body.length))
      assert(r._6 === Some(md5hex(body.getBytes("ISO-8859-1"))))
      assert(r._7 === Some(body))
    }
  }

  test("real zlib deflate body decodes (RFC 9110 deflate = zlib-wrapped)") {
    val body = "compressed with a REAL deflater, dynamic codes and all " * 8
    val zz = zlib(body.getBytes("ISO-8859-1"))
    val msg = "HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n" +
      s"Content-Length: ${zz.length}\r\n\r\n" + s(zz)
    val r = one(msg)
    assert(r._1 && r._7 === Some(body))
  }

  test("corrupted gzip quarantines as bad-encoded-body, headers kept") {
    val gz = gzip("payload".getBytes("ISO-8859-1"))
    gz(gz.length - 5) = (gz(gz.length - 5) ^ 1).toByte // flip a CRC bit
    val msg = "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      s"Content-Length: ${gz.length}\r\n\r\n" + s(gz)
    val r = one(msg)
    assert(!r._1 && r._2 === HttpMessage.ErrBadEncodedBody)
    assert(r._3 === Some(200) && r._4 === "gzip") // diagnosis survives
    assert(r._7.isEmpty)
  }

  test("unsupported coding (br) quarantines without touching the body") {
    val msg = "HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n" +
      "Content-Length: 4\r\n\r\nabcd"
    val r = one(msg)
    assert(!r._1 && r._2 === HttpMessage.ErrUnsupportedEnc)
  }

  test("identity coding and absent Content-Length (connection-close) pass") {
    val r1 = one("HTTP/1.1 200 OK\r\nContent-Encoding: identity\r\n" +
      "Content-Length: 2\r\n\r\nhi")
    assert(r1._1 && r1._4 === "" && r1._7 === Some("hi"))
    val r2 = one("HTTP/1.0 200 OK\r\n\r\nclose-delimited body")
    assert(r2._1 && r2._7 === Some("close-delimited body"))
  }

  test("chunked: more chunks than maxChunks quarantines as bad framing") {
    val chunks = (1 to 6).map(i => s"1\r\n$i\r\n").mkString
    val msg = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      chunks + "0\r\n\r\n"
    val ok = one(msg, maxChunks = 16)
    assert(ok._1 && ok._7 === Some("123456"))
    val bounded = one(msg, maxChunks = 4)
    assert(!bounded._1 && bounded._2 === HttpMessage.ErrBadChunk)
  }

  test("no header terminator quarantines first") {
    val r = one("HTTP/1.1 200 OK\r\nContent-Length: 2\r\nhi")
    assert(!r._1 && r._2 === HttpMessage.ErrNoTerminator)
  }

  test("chunked with gzip content-coding composes: de-chunk THEN inflate") {
    val body = "chunk-then-gzip composition " * 10
    val gz = gzip(body.getBytes("ISO-8859-1"))
    val (a, b) = gz.splitAt(gz.length / 2)
    def hx(n: Int) = Integer.toHexString(n)
    val msg = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Encoding: gzip\r\n\r\n" +
      s"${hx(a.length)}\r\n" + s(a) + "\r\n" +
      s"${hx(b.length)}\r\n" + s(b) + "\r\n0\r\n\r\n"
    val r = one(msg)
    assert(r._1 && r._7 === Some(body))
  }

  test("decompression-bomb guard: inflated size past maxBodyBytes rejects") {
    val big = Array.fill[Byte](1 << 16)('a')
    val gz = gzip(big)
    val msg = "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      s"Content-Length: ${gz.length}\r\n\r\n" + s(gz)
    val r = HttpMessage.responses(
      Seq((1L, msg)).toDF("id", "msg"), "id", "msg",
      maxBodyBytes = 1 << 10)
      .select("ok", "err").as[(Boolean, String)].head()
    assert(!r._1 && r._2 === HttpMessage.ErrBadEncodedBody)
  }
}
