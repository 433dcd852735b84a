package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Surt]] — key chain forms, the CDX composition over a real
  * `.warc.gz` file, and revisit detection the arithmetic gate (q_c35)
  * only samples.
  */
class SurtSpec extends SparkSpec {
  import spark.implicits._

  private def key(url: String): String =
    Seq(url).toDF("u").select(Surt.surtKey(col("u")).as("k"))
      .as[String].collect().head

  test("surt key: case fold, www strip, port strip, host reversal") {
    assert(key("https://WWW.Example.COM/Path/X") === "com,example)/path/x")
    assert(key("http://example.com:80/") === "com,example)/")
    assert(key("https://example.com:443/a") === "com,example)/a")
    assert(key("http://example.com:8080/a") === "com,example:8080)/a")
    assert(key("http://www7.sub.example.co.uk/x") ===
      "uk,co,example,sub)/x")
    assert(key("http://example.com./x") === "com,example)/x")
    assert(key("http://u:p@example.com/x") === "com,example)/x")
  }

  test("surt key: path default, fragment drop, query sort") {
    assert(key("https://example.com") === "com,example)/")
    assert(key("https://example.com/a#frag") === "com,example)/a")
    assert(key("https://example.com/a?b=2&a=1&c=3") ===
      "com,example)/a?a=1&b=2&c=3")
    assert(key("https://example.com/a?") === "com,example)/a")
    assert(key("https://example.com/a?z=1") === "com,example)/a?z=1")
  }

  test("revisits: equal-digest runs mark after the first, per key") {
    val idx = Seq(
      ("com,a)/", "2024-01-01", "u", "m", 200, "d1", 1L, true),
      ("com,a)/", "2024-01-02", "u", "m", 200, "d1", 1L, true),
      ("com,a)/", "2024-01-03", "u", "m", 200, "d2", 1L, true),
      ("com,a)/", "2024-01-04", "u", "m", 200, "d1", 1L, true),
      ("com,b)/", "2024-01-01", "v", "m", 200, "d1", 1L, true))
      .toDF("surt_key", "warc_date", "url", "mime", "status", "digest",
        "length", "rec_ok")
    val got = Surt.revisits(idx).orderBy("surt_key", "warc_date")
      .select("is_revisit").as[Boolean].collect().toSeq
    assert(got === Seq(false, true, false, false, false))
  }

  test("fetch plan: surt-matched probe, latest capture wins, new vs seen") {
    val index = Seq(
      ("com,a)/p", "2024-01-01", "https://a.com/p", "d1"),
      ("com,a)/p", "2024-01-03", "https://a.com/p", "d3"),
      ("com,a)/p", "2024-01-02", "https://a.com/p", "d2"))
      .toDF("surt_key", "warc_date", "url", "digest")
    val frontier = Seq(
      "https://WWW.A.com/p", // spelling variant of the indexed capture
      "https://a.com/q")     // never captured
      .toDF("url")
    val got = Surt.fetchPlan(index, frontier, "url")
      .orderBy("url")
      .select("url", "surt_key", "status", "last_date", "last_digest")
      .as[(String, String, String, Option[String], Option[String])]
      .collect().toSeq
    assert(got === Seq(
      ("https://WWW.A.com/p", "com,a)/p", "seen",
        Some("2024-01-03"), Some("d3")),
      ("https://a.com/q", "com,a)/q", "new", None, None)))
  }

  test("cdx index: warc.gz walk + inline envelope, index order") {
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    def rec(typ: String, uri: String, payload: Array[Byte]): Array[Byte] = {
      val head = "WARC/1.0\r\n" + s"WARC-Type: $typ\r\n" +
        "WARC-Record-ID: <urn:uuid:x>\r\n" +
        "WARC-Date: 2024-02-01T00:00:00Z\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n"
      head.getBytes("ISO-8859-1") ++ payload ++
        "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val body = "<html>hi</html>"
    val msg = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      s"charset=UTF-8\r\nContent-Length: ${body.length}\r\n\r\n" + body)
      .getBytes("ISO-8859-1")
    val malformed = "NOT-HTTP\r\n\r\nx".getBytes("ISO-8859-1")
    val file =
      gzip(rec("response", "https://www.B.com/z?b=2&a=1", msg)) ++
        gzip(rec("response", "https://a.com/y", malformed)) ++
        gzip(rec("request", "https://a.com/y", msg)) // non-response: skipped
    val got = Surt.cdxIndex(Seq((1L, file)).toDF("id", "gz"), "id", "gz")
      .select("surt_key", "url", "mime", "status", "rec_ok")
      .as[(String, String, Option[String], Option[Int], Boolean)]
      .collect().toSeq
    assert(got === Seq(
      // header-plane diagnosis on the malformed envelope: mime parses
      // best-effort to the empty string, status stays null
      ("com,a)/y", "https://a.com/y", Some(""), None, false),
      ("com,b)/z?a=1&b=2", "https://www.B.com/z?b=2&a=1",
        Some("text/html"), Some(200), true)))
  }
}
