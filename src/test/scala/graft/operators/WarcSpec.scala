package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def rec(
      typ: String, id: String, uri: String, date: String,
      payload: String): String =
    "WARC/1.0\r\n" +
      s"WARC-Type: $typ\r\n" +
      s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "Content-Type: application/http\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n" + payload + "\r\n\r\n"

  private val r0 = rec("response", "aaa", "https://ex.com/1",
    "2024-01-01T00:00:00Z", "HTTP/1.1 200 OK\r\n\r\nhello world")
  private val r1 = rec("request", "bbb", "https://ex.com/2",
    "2024-01-02T00:00:00Z", "GET / HTTP/1.1")
  // payload that CONTAINS a fake record head — only a length-driven
  // walk parses past it correctly
  private val r2 = rec("response", "ccc", "https://ex.com/3",
    "2024-01-03T00:00:00Z", "decoy WARC/1.0\r\nWARC-Type: fake\r\n\r\nx")

  test("multi-record file parses with length-driven offsets") {
    val got = Warc.records(
      Seq((1L, r0 + r1 + r2)).toDF("id", "w"), "id", "w")
      .orderBy("rec_idx")
      .as[(Long, Int, String, String, String, String, Long, String)]
      .collect().toSeq
    assert(got.map(_._3) === Seq("response", "request", "response"))
    assert(got.map(_._5) === Seq(
      "https://ex.com/1", "https://ex.com/2", "https://ex.com/3"))
    assert(got(0)._7 === "HTTP/1.1 200 OK\r\n\r\nhello world".length.toLong)
    assert(got(0)._8 === md5hex("HTTP/1.1 200 OK\r\n\r\nhello world"))
    assert(got(2)._8 === md5hex("decoy WARC/1.0\r\nWARC-Type: fake\r\n\r\nx"))
    assert(got(1)._4 === "<urn:uuid:bbb>")
  }

  test("header names match case-insensitively, colon whitespace optional") {
    // spec-legal variants: lowercase names, no space / tab after ':'
    val loose = "WARC/1.0\r\n" +
      "warc-type: response\r\n" +
      "WARC-RECORD-ID:<urn:uuid:ddd>\r\n" +
      "Warc-Date:\t2024-01-04T00:00:00Z\r\n" +
      "warc-target-uri: https://ex.com/4\r\n" +
      "content-length:5\r\n" +
      "\r\nhello\r\n\r\n"
    val got = Warc.records(Seq((1L, loose)).toDF("id", "w"), "id", "w")
      .as[(Long, Int, String, String, String, String, Long, String)]
      .collect().toSeq
    assert(got.size === 1)
    assert(got.head._3 === "response")
    assert(got.head._4 === "<urn:uuid:ddd>")
    assert(got.head._6 === "2024-01-04T00:00:00Z")
    assert(got.head._7 === 5L)
    assert(got.head._8 === md5hex("hello"))
  }

  test("malformed tails invalidate the whole file") {
    val truncated = (r0 + r1).dropRight(3) // missing record trailer
    val wrongLen = r0.replace(
      s"Content-Length: ${"HTTP/1.1 200 OK\r\n\r\nhello world".length}",
      "Content-Length: 9999")
    val badVersion = "WARC/9.9\r\n" + r0.drop(10)
    val junkTail = r0 + "junk"
    val df = Seq(
      (0L, r0 + r1), (1L, truncated), (2L, wrongLen),
      (3L, badVersion), (4L, junkTail), (5L, ""), (6L, null.asInstanceOf[String]))
      .toDF("id", "w")
    val sum = Warc.fileSummary(df, "id", "w")
      .orderBy("file_id")
      .as[(Long, Boolean, Int, Long)].collect().toSeq
    assert(sum.map(_._2) === Seq(true, false, false, false, false, true, true))
    assert(sum.head._3 === 2)
    assert(sum.head._4 ===
      ("HTTP/1.1 200 OK\r\n\r\nhello world".length + "GET / HTTP/1.1".length).toLong)
    // empty cell: zero records, trivially valid (nothing malformed)
    assert(sum(5)._3 === 0 && sum(6)._3 === 0)
    assert(Warc.records(df, "id", "w")
      .filter($"file_id" =!= 0L).count() === 0L)
  }

  test("maxRecords bounds the walk: an over-long group is invalid") {
    val three = r0 + r1 + r2
    val sum2 = Warc.fileSummary(
      Seq((1L, three)).toDF("id", "w"), "id", "w", maxRecords = 2)
      .as[(Long, Boolean, Int, Long)].collect().head
    assert(!sum2._2)
    val sum3 = Warc.fileSummary(
      Seq((1L, three)).toDF("id", "w"), "id", "w", maxRecords = 3)
      .as[(Long, Boolean, Int, Long)].collect().head
    assert(sum3._2 && sum3._3 === 3)
  }

  test("missing Content-Length header invalidates") {
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n"
    val sum = Warc.fileSummary(Seq((1L, noLen)).toDF("id", "w"), "id", "w")
      .as[(Long, Boolean, Int, Long)].collect().head
    assert(!sum._2)
  }
}
