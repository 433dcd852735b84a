package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[LinkExtract]] — href extraction forms, RFC 3986 resolution cases
  * (incl. the dot-segment bound), base-tag override, and the host
  * graph aggregation the arithmetic gate (q_c34) only samples.
  */
class LinkExtractSpec extends SparkSpec {
  import spark.implicits._

  private def res(base: String, ref: String): Option[String] = {
    val out = Seq((base, ref)).toDF("b", "r")
      .select(LinkExtract.resolve(col("b"), col("r")).as("u"))
      .as[Option[String]].collect()
    out.head
  }

  test("href forms: double-quoted, single-quoted, bare, entity-encoded") {
    val html =
      """<a href="/a">x</a> <A HREF='/b'>y</A> <a id=k href=/c>z</a>
        |<a href="/d?x=1&amp;y=2">w</a> <a rel=nofollow>no href</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(explode(LinkExtract.hrefs(col("h"))).as("v"))
      .as[String].collect().toSeq
    assert(got === Seq("/a", "/b", "/c", "/d?x=1&y=2"))
  }

  test("resolution: absolute, protocol-relative, root, query, relative") {
    val b = "https://www.example.com/dir/sub/page.html?q=1"
    assert(res(b, "http://other.org/x") === Some("http://other.org/x"))
    assert(res(b, "//cdn.example.com/lib.js") ===
      Some("https://cdn.example.com/lib.js"))
    assert(res(b, "/root/x") === Some("https://www.example.com/root/x"))
    assert(res(b, "?page=2") ===
      Some("https://www.example.com/dir/sub/page.html?page=2"))
    assert(res(b, "other.html") ===
      Some("https://www.example.com/dir/sub/other.html"))
    assert(res(b, "a/b.html") ===
      Some("https://www.example.com/dir/sub/a/b.html"))
  }

  test("dot segments: ./, ../, nesting, root clamp, trailing forms") {
    val b = "https://h.io/a/b/c/page.html"
    assert(res(b, "./x") === Some("https://h.io/a/b/c/x"))
    assert(res(b, "../x") === Some("https://h.io/a/b/x"))
    assert(res(b, "../../x") === Some("https://h.io/a/x"))
    assert(res(b, "../../../../../x") === Some("https://h.io/x")) // clamp
    assert(res(b, "d/../e") === Some("https://h.io/a/b/c/e"))
    assert(res(b, "..") === Some("https://h.io/a/b/"))
    assert(res(b, ".") === Some("https://h.io/a/b/c/"))
    assert(res(b, "x/./y/../z?k=v") === Some("https://h.io/a/b/c/x/z?k=v"))
  }

  test("self-links and non-fetchable schemes drop; fragments strip") {
    val b = "https://h.io/p"
    assert(res(b, "") === None)
    assert(res(b, "#top") === None)
    assert(res(b, "javascript:void(0)") === None)
    assert(res(b, "MAILTO:a@b.c") === None)
    assert(res(b, "tel:+123") === None)
    assert(res(b, "data:text/plain,hi") === None)
    assert(res(b, "/x#frag") === Some("https://h.io/x"))
    assert(res(b, "q.html#s2") === Some("https://h.io/q.html"))
  }

  test("scheme-less base yields NULL (resolution needs an origin)") {
    assert(res("not a url", "/x") === None)
  }

  test("base tag overrides page url; itself resolves against the page") {
    val pages = Seq(
      (1L, "https://h.io/dir/p.html",
        "<base href=\"/other/\"><a href=\"x\">x</a>"),
      (2L, "https://h.io/dir/p.html",
        "<base href=\"sub/\"><a href=\"x\">x</a>"),
      (3L, "https://h.io/dir/p.html", "<a href=\"x\">x</a>"))
      .toDF("doc_id", "url", "html")
    val got = LinkExtract.outlinks(pages, "doc_id", "url", "html")
      .orderBy("doc_id").select("doc_id", "url")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, "https://h.io/other/x"),
      (2L, "https://h.io/dir/sub/x"),
      (3L, "https://h.io/dir/x")))
  }

  test("outlinks dedup per page on the CANONICAL url") {
    val pages = Seq((1L, "https://h.io/p",
      "<a href=\"/x\">1</a><a href=\"/x#frag\">2</a>" +
        "<a href=\"/x?utm_source=z\">3</a><a href=\"/y\">4</a>"))
      .toDF("doc_id", "url", "html")
    val got = LinkExtract.outlinks(pages, "doc_id", "url", "html")
      .orderBy("url").select("url").as[String].collect().toSeq
    assert(got === Seq("https://h.io/x", "https://h.io/y"))
  }

  test("host graph: self-host edges drop, weights count links") {
    val pages = Seq(
      (1L, "https://a.io/p",
        "<a href=\"https://b.io/1\">x</a><a href=\"https://b.io/2\">y</a>" +
          "<a href=\"/self\">s</a>"),
      (2L, "https://a.io/q", "<a href=\"https://b.io/1\">z</a>"),
      (3L, "https://b.io/r", "<a href=\"https://a.io/p\">w</a>"))
      .toDF("doc_id", "url", "html")
    val got = LinkExtract.hostGraph(pages, "doc_id", "url", "html")
      .orderBy("src_host", "dst_host")
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("a.io", "b.io", 3L), ("b.io", "a.io", 1L)))
  }
}
