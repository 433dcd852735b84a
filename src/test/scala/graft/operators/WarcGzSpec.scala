package graft.operators

import java.io.ByteArrayOutputStream
import java.security.MessageDigest
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

class WarcGzSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  private def gzip(payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(payload)
    g.close()
    bos.toByteArray
  }

  private def rec(
      typ: String, id: String, uri: String, payload: Array[Byte],
      version: String = "WARC/1.0"): Array[Byte] = {
    val head = s"$version\r\n" +
      s"WARC-Type: $typ\r\n" +
      s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
      "WARC-Date: 2024-02-01T00:00:00Z\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  test("one gzip member per record: multi-record file parses; payload md5 over BYTES") {
    // second payload exercises the byte-exact path: 0x80-0xFF bytes
    // survive the ISO-8859-1 round trip (a UTF-8 cast would mangle them)
    val p0 = "HTTP/1.1 200 OK\r\n\r\nhello".getBytes("ISO-8859-1")
    val p1 = Array.tabulate[Byte](64)(i => (i * 5 - 128).toByte)
    val file = gzip(rec("response", "a", "https://ex.com/1", p0)) ++
      gzip(rec("metadata", "b", "https://ex.com/2", p1))
    val got = WarcGz.records(Seq((7L, file)).toDF("id", "gz"), "id", "gz")
      .orderBy("rec_idx")
      .as[(Long, Int, String, String, String, String, Long, String)]
      .collect().toSeq
    assert(got.map(r => (r._2, r._3, r._5, r._7)) === Seq(
      (0, "response", "https://ex.com/1", p0.length.toLong),
      (1, "metadata", "https://ex.com/2", p1.length.toLong)))
    assert(got(0)._8 === md5hex(p0))
    assert(got(1)._8 === md5hex(p1))
  }

  test("quarantine classes: bad version, two records in one member, truncated member, decoy text") {
    val p = "x".getBytes("ISO-8859-1")
    val good = gzip(rec("response", "ok", "https://ex.com/ok", p))
    // a payload containing a decoy record head parses fine (length-driven)
    val decoy = gzip(rec("response", "d", "https://ex.com/d",
      "WARC/1.0\r\nWARC-Type: fake\r\n\r\n".getBytes("ISO-8859-1")))
    val badVersion = gzip(rec("response", "v", "https://ex.com/v", p,
      version = "WARC/9.9"))
    val twoInOne = gzip(
      rec("response", "t1", "https://ex.com/t1", p) ++
        rec("response", "t2", "https://ex.com/t2", p))
    val truncated = good.dropRight(3)
    val df = Seq(
      (1L, good ++ decoy),
      (2L, good ++ badVersion),  // one bad member -> whole file out
      (3L, twoInOne),            // violates one-record-per-member
      (4L, truncated)).toDF("id", "gz")
    val recs = WarcGz.records(df, "id", "gz")
      .select("file_id").as[Long].collect().toSeq
    assert(recs.toSet === Set(1L))
    val summary = WarcGz.fileSummary(df, "id", "gz")
      .orderBy("file_id")
      .as[(Long, Boolean, Int, Long)].collect().toSeq
    assert(summary.map(s => (s._1, s._2)) ===
      Seq((1L, true), (2L, false), (3L, false), (4L, false)))
    assert(summary.head._3 === 2) // good + decoy
  }

  test("tolerant headers inside members: lowercase names, no colon space") {
    val body = "WARC/1.0\r\n" +
      "warc-type: conversion\r\n" +
      "warc-record-id:<urn:uuid:z>\r\n" +
      "warc-date:\t2024-02-02T00:00:00Z\r\n" +
      "warc-target-uri: https://ex.com/z\r\n" +
      "content-length:3\r\n\r\nabc\r\n\r\n"
    val got = WarcGz.records(
      Seq((1L, gzip(body.getBytes("ISO-8859-1")))).toDF("id", "gz"),
      "id", "gz")
      .as[(Long, Int, String, String, String, String, Long, String)]
      .collect().toSeq
    assert(got.size === 1)
    assert(got.head._3 === "conversion")
    assert(got.head._7 === 3L)
    assert(got.head._8 === md5hex("abc".getBytes("ISO-8859-1")))
  }
}
