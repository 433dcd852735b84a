package graft.operators

import java.nio.charset.{Charset, CodingErrorAction}

import graft.SparkSpec

/** [[CharsetDecode]] — java.nio parity on real byte ranges plus the
  * sniff-precedence and window rules the arithmetic gate (q_t43) only
  * samples.
  */
class CharsetDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** Decode bytes via java.nio with REPLACE (the browser posture). */
  private def nio(bytes: Array[Byte], cs: String): String = {
    val d = Charset.forName(cs).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    d.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  private def byteView(bytes: Array[Byte]): String =
    new String(bytes, "ISO-8859-1")

  private def run(
      raw: String, hdr: String): (String, String, Boolean, Option[String]) =
    CharsetDecode.decodeAll(
      Seq((1L, raw, hdr)).toDF("id", "raw", "hdr"), "id", "raw",
      Some("hdr"))
      .select("charset", "charset_source", "decodable", "text")
      .as[(String, String, Boolean, Option[String])]
      .head()

  test("cp1252 parity with java.nio over ALL 256 byte values") {
    val bytes = Array.tabulate[Byte](256)(_.toByte)
    val got = run(byteView(bytes), "cp1252")
    assert(got._1 === "windows-1252" && got._2 === "header")
    assert(got._4 === Some(nio(bytes, "windows-1252")))
  }

  test("latin-1 parity over ALL 256 byte values (the default arm)") {
    val bytes = Array.tabulate[Byte](256)(_.toByte)
    val got = run(byteView(bytes), "")
    assert(got._1 === "iso-8859-1" && got._2 === "default")
    assert(got._4 === Some(nio(bytes, "ISO-8859-1")))
  }

  test("utf-8 lenient parity: valid multibyte, malformed, and truncated") {
    val cases = Seq(
      "café € 你好".getBytes("UTF-8"),
      Array[Byte](0x61, 0xC3.toByte, 0x28, 0x62), // bad continuation
      Array[Byte](0x61, 0xE2.toByte, 0x82.toByte)) // truncated 3-byte seq
    for (bytes <- cases) {
      val got = run(byteView(bytes), "utf-8")
      assert(got._4 === Some(nio(bytes, "UTF-8")),
        s"bytes=${bytes.map("%02x".format(_)).mkString}")
    }
  }

  test("BOM outranks the transport header; BOM is stripped on utf-8") {
    val body = "café".getBytes("UTF-8")
    val raw = byteView(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
      ++ body)
    val got = run(raw, "windows-1252")
    assert(got._1 === "utf-8" && got._2 === "bom")
    assert(got._4 === Some("café")) // no U+FEFF prefix
  }

  test("meta declaration is honored only inside the sniff window") {
    val meta = "<meta charset='cp1252'>"
    val near = "x" * 10 + meta + "body"
    val far = "x" * 2000 + meta + "body"
    assert(run(near, "")._1 === "windows-1252")
    assert(run(near, "")._2 === "meta")
    val gotFar = run(far, "")
    assert(gotFar._1 === "iso-8859-1" && gotFar._2 === "default")
  }

  test("utf-16 BOMs are detected but honestly not decoded") {
    for ((bom, name) <- Seq(
      (Array[Byte](0xFF.toByte, 0xFE.toByte), "utf-16le"),
      (Array[Byte](0xFE.toByte, 0xFF.toByte), "utf-16be"))) {
      val got = run(byteView(bom ++ "hi".getBytes("ISO-8859-1")), "")
      assert(got._1 === name && got._2 === "bom")
      assert(!got._3 && got._4.isEmpty)
    }
  }

  test("alias table: declared names normalize; unknown names quarantine") {
    assert(run("abc", "Latin1")._1 === "iso-8859-1")
    assert(run("abc", "UTF8")._1 === "utf-8")
    assert(run("abc", "US-ASCII")._1 === "ascii")
    assert(run("abc", "US-ASCII")._4 === Some("abc"))
    val unk = run("abc", "koi8-r")
    assert(unk._1 === "koi8-r" && !unk._3 && unk._4.isEmpty)
  }

  test("http-equiv form of the meta declaration parses too") {
    val raw = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-1\"></head><body>ok"
    val got = run(raw, "")
    assert(got._1 === "iso-8859-1" && got._2 === "meta")
  }
}
